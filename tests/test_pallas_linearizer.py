"""Pallas fused linearizer vs the jnp reference implementation."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from g2o_frontend_tpu.ops.pallas_linearizer import (
    linearize_pallas,
    pack_inputs,
)
from g2o_frontend_tpu.pwn.aligner import AlignerConfig, _linearize
from g2o_frontend_tpu.pwn.converter import ConverterConfig, depth_to_cloud
from g2o_frontend_tpu.utils.synth import default_projector, render_planes_depth

INTERPRET = jax.default_backend() == "cpu"


def _fixture():
    proj = default_projector(H=96, W=128)
    ccfg = ConverterConfig(min_image_radius=3, max_image_radius=8, min_points=12)
    T = np.eye(4)
    T[:3, 3] = [0.05, -0.02, 0.04]
    ref = depth_to_cloud(render_planes_depth(np.eye(4), proj), proj, ccfg)
    cur = depth_to_cloud(render_planes_depth(T, proj), proj, ccfg)
    from g2o_frontend_tpu.pwn.aligner import _correspondences_gather

    cfg = AlignerConfig()
    invT = jnp.eye(4)
    mask, ref_pts, ref_nrm = _correspondences_gather(ref, cur, invT, proj, cfg)
    # association returns channel-planar (3, H, W); the trailing-layout
    # reference linearizer and the pallas packer expect (H, W, 3)
    ref_pts = jnp.moveaxis(ref_pts, 0, -1)
    ref_nrm = jnp.moveaxis(ref_nrm, 0, -1)
    return cfg, invT, mask, ref_pts, ref_nrm, cur


class TestPallasLinearizer:
    def test_matches_jnp_linearizer(self):
        cfg, invT, mask, ref_pts, ref_nrm, cur = _fixture()
        H_ref, b_ref, chi2_ref, inl_ref = _linearize(
            mask, ref_pts, ref_nrm, cur, invT, cfg
        )
        # kernel expects pre-remapped reference (invT = I here, so identity)
        packed = pack_inputs(
            np.asarray(mask),
            ref_pts,
            ref_nrm,
            cur.points,
            cur.normals,
            np.asarray(cur.omega_p),
            np.asarray(cur.omega_n),
        )
        H, b, chi2, inl = linearize_pallas(packed, cfg.inlier_max_chi2,
                                           interpret=INTERPRET)
        assert int(inl) == int(inl_ref)
        np.testing.assert_allclose(float(chi2), float(chi2_ref), rtol=1e-4)
        np.testing.assert_allclose(np.asarray(b), np.asarray(b_ref), rtol=2e-4,
                                   atol=2e-2)
        np.testing.assert_allclose(np.asarray(H), np.asarray(H_ref), rtol=2e-4,
                                   atol=5e-1)

    def test_symmetry(self):
        cfg, invT, mask, ref_pts, ref_nrm, cur = _fixture()
        packed = pack_inputs(
            np.asarray(mask), ref_pts, ref_nrm, cur.points, cur.normals,
            np.asarray(cur.omega_p), np.asarray(cur.omega_n),
        )
        H, b, chi2, inl = linearize_pallas(packed, cfg.inlier_max_chi2,
                                           interpret=INTERPRET)
        np.testing.assert_allclose(np.asarray(H), np.asarray(H).T, rtol=1e-5,
                                   atol=1e-3)
