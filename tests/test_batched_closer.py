"""Batched candidate matching (SURVEY Phase 5: the vmap the reference's
closer does serially, ``pwn_closer.cpp:92-110``)."""
import numpy as np
import pytest

import jax.numpy as jnp

from g2o_frontend_tpu.pwn.aligner import AlignerConfig
from g2o_frontend_tpu.pwn.converter import ConverterConfig, depth_to_cloud
from g2o_frontend_tpu.slam.pwn_matcher import (
    match_clouds, match_clouds_batch, stack_clouds)
from g2o_frontend_tpu.utils import lie
from g2o_frontend_tpu.utils.synth import default_projector, render_planes_depth


def _clouds(n=9):
    proj = default_projector(H=96, W=128)
    ccfg = ConverterConfig(min_image_radius=2, max_image_radius=6, min_points=10)
    rng = np.random.default_rng(3)
    clouds, poses = [], []
    for k in range(n):
        xi = np.concatenate([rng.normal(0, 0.05, 3), rng.normal(0, 0.03, 3)])
        T = np.asarray(lie.se3_exp(jnp.asarray(xi, jnp.float32)))
        depth = render_planes_depth(T, proj)
        clouds.append(depth_to_cloud(depth, proj, ccfg))
        poses.append(T)
    return proj, clouds, poses


def test_batch_matches_serial():
    """K batched candidate alignments == K serial match_clouds calls."""
    proj, clouds, poses = _clouds(9)
    cur = clouds[0]
    refs = clouds[1:]
    acfg = AlignerConfig(outer_iterations=4, association="gather")
    guesses = np.stack(
        [np.linalg.inv(np.linalg.inv(poses[0]) @ poses[k + 1])
         for k in range(len(refs))]
    ).astype(np.float32)

    serial = [
        match_clouds(r, cur, proj, jnp.asarray(g), acfg)
        for r, g in zip(refs, guesses)
    ]
    batch = match_clouds_batch(
        stack_clouds(refs), cur, proj, jnp.asarray(guesses), acfg
    )
    for k, s in enumerate(serial):
        np.testing.assert_allclose(
            np.asarray(batch.transform)[k], np.asarray(s.transform),
            atol=1e-5,
        )
        assert int(np.asarray(batch.image_inliers)[k]) == int(s.image_inliers)
        assert int(np.asarray(batch.cloud_inliers)[k]) == int(s.cloud_inliers)
