"""Synthetic scene generation for tests and benchmarks.

Plays the role of the reference's simulators-as-fixtures
(``graph_merge/graph_simulator.h``, ``planeDatasetGenerator/``; SURVEY.md §4):
analytic plane-scene depth rendering with exact ground truth.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..pwn.projector import PinholeProjector

# A closed "room" of 6 axis-aligned planes (normals point inward).
# Deliberately ASYMMETRIC wall distances: a symmetric box admits a 180-deg
# yaw ambiguity that lets dense alignment lock onto the mirrored basin.
ROOM_PLANES = [
    (np.array([0.0, 0.0, -1.0]), -2.5),  # back wall z = 2.5
    (np.array([0.0, 0.0, 1.0]), -2.0),  # front wall z = -2.0
    (np.array([-1.0, 0.0, 0.0]), -1.8),  # right wall x = 1.8
    (np.array([1.0, 0.0, 0.0]), -1.3),  # left wall x = -1.3
    (np.array([0.0, -1.0, 0.0]), -1.0),  # floor y = 1.0
    (np.array([0.0, 1.0, 0.0]), -0.8),  # ceiling y = -0.8
]


def render_planes_depth(T_wc, projector: PinholeProjector, planes=None):
    """Ray-cast a set of planes (n, d) with n.p = d from camera pose T_wc."""
    planes = planes if planes is not None else ROOM_PLANES
    H, W = projector.rows, projector.cols
    vs, us = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    dirs = np.stack(
        [
            (us - projector.cx) / projector.fx,
            (vs - projector.cy) / projector.fy,
            np.ones_like(us, float),
        ],
        -1,
    )
    R, t = T_wc[:3, :3], T_wc[:3, 3]
    dirs_w = dirs @ R.T
    depth = np.full((H, W), np.inf)
    for n, d in planes:
        denom = dirs_w @ n
        z = np.where(np.abs(denom) > 1e-9, (d - t @ n) / denom, np.inf)
        depth = np.minimum(depth, np.where(z > 0.05, z, np.inf))
    depth[~np.isfinite(depth)] = 0.0
    return jnp.asarray(depth, jnp.float32)


def default_projector(H=120, W=160):
    return PinholeProjector(
        rows=H,
        cols=W,
        fx=131.25 * W / 160,
        fy=131.25 * W / 160,
        cx=W / 2 - 0.5,
        cy=H / 2 - 0.5,
        min_distance=0.1,
        max_distance=10.0,
    )
