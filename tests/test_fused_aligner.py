"""Fused Pallas aligner (ops/pallas_aligner) vs the gather reference path.

Runs the production fused kernel in Pallas interpret mode on CPU (the same
code path the TPU executes, minus Mosaic lowering) on a small synthetic
scene and checks (a) the Gauss-Newton system against the jnp gather twin
and (b) end-to-end align() convergence — the analog of the reference's
CUDA-vs-CPU aligner test (``pwn_cuda`` drop-in contract, cualigner.h:8-11).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from g2o_frontend_tpu.ops import pallas_aligner as pa
from g2o_frontend_tpu.pwn.aligner import (
    AlignerConfig,
    _correspondences_gather,
    _linearize_planar,
    align,
)
from g2o_frontend_tpu.pwn.converter import ConverterConfig, depth_to_cloud
from g2o_frontend_tpu.utils import lie
from g2o_frontend_tpu.utils.synth import default_projector, render_planes_depth

INTERPRET = jax.default_backend() != "tpu"


def _scene(H=96, W=128):
    proj = default_projector(H=H, W=W)
    ccfg = ConverterConfig(min_image_radius=3, max_image_radius=8, min_points=12)
    xi = jnp.asarray([0.02, -0.01, 0.03, 0.01, -0.008, 0.006], jnp.float32)
    T = np.asarray(lie.se3_v2t(xi))
    ref = depth_to_cloud(render_planes_depth(np.eye(4), proj), proj, ccfg)
    cur = depth_to_cloud(render_planes_depth(T, proj), proj, ccfg)
    return proj, ref, cur, T


class TestFusedAligner:
    def test_bf16_pair_pack_roundtrip(self):
        """pack_ref2 / _unpack_hi / _unpack_lo: bf16 round-trip accuracy and
        exact sentinel preservation."""
        rng = np.random.default_rng(0)
        ref5 = jnp.asarray(rng.normal(size=(5, 8, 128)).astype(np.float32))
        ref5 = ref5.at[4, 0, :].set(-1.0)  # curv sentinel row
        pk = pa.pack_ref2(ref5)
        assert pk.dtype == jnp.int32 and pk.shape == (3, 8, 128)
        d = pa._unpack_hi(pk[0]);  cv = pa._unpack_lo(pk[0])
        nx = pa._unpack_hi(pk[1]); ny = pa._unpack_lo(pk[1])
        nz = pa._unpack_hi(pk[2])
        # bf16 has 8 mantissa bits -> rel error < 2^-8
        for got, ref in [(d, ref5[0]), (nx, ref5[1]), (ny, ref5[2]),
                         (nz, ref5[3]), (cv, ref5[4])]:
            np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                       rtol=2 ** -8, atol=1e-6)
        assert np.all(np.asarray(cv)[0] == -1.0)  # sentinel exact

    def test_packed_matches_f32_path(self):
        """The packed (bf16-pair, 3-gather) sweep must agree with the f32
        5-gather path within bf16 payload noise."""
        proj, ref, cur, _ = _scene()
        cfg = AlignerConfig()
        invT = jnp.eye(4, dtype=jnp.float32)
        kw = dict(
            H=proj.rows, W=proj.cols, TR=cfg.tile_rows, TC=cfg.tile_cols,
            DV=cfg.band_dv, DU=cfg.band_du,
            fx=proj.fx, fy=proj.fy, cx=proj.cx, cy=proj.cy,
            min_d=proj.min_distance, max_d=proj.max_distance,
            nthr=cfg.inlier_normal_angular_threshold,
            dthr2=cfg.inlier_distance_threshold**2,
            cthr=cfg.flat_curvature_threshold,
            rthr=cfg.inlier_curvature_ratio_threshold,
            max_chi2=cfg.inlier_max_chi2,
            robust=cfg.robust_kernel, interpret=INTERPRET)
        outs = {}
        for packed in (True, False):
            cur_p, ref_p = pa.prepare_fused_inputs(
                ref, cur, TR=cfg.tile_rows, TC=cfg.tile_cols,
                DV=cfg.band_dv, DU=cfg.band_du, packed=packed)
            outs[packed] = np.asarray(pa.fused_linearize(
                cur_p, ref_p, pa.params_from_invT(invT), **kw))
        # inlier counts near-identical; sums within bf16 noise
        assert abs(outs[True][28] - outs[False][28]) <= (
            0.002 * outs[False][28] + 2)
        np.testing.assert_allclose(outs[True][:28], outs[False][:28],
                                   rtol=0.02, atol=0.5)

    def test_system_matches_gather_twin(self):
        proj, ref, cur, _ = _scene()
        cfg = AlignerConfig()
        invT = jnp.eye(4, dtype=jnp.float32)
        cur_p, ref_p = pa.prepare_fused_inputs(
            ref, cur, TR=cfg.tile_rows, TC=cfg.tile_cols,
            DV=cfg.band_dv, DU=cfg.band_du,
        )
        sums = pa.fused_linearize(
            cur_p, ref_p, pa.params_from_invT(invT),
            H=proj.rows, W=proj.cols,
            TR=cfg.tile_rows, TC=cfg.tile_cols,
            DV=cfg.band_dv, DU=cfg.band_du,
            fx=proj.fx, fy=proj.fy, cx=proj.cx, cy=proj.cy,
            min_d=proj.min_distance, max_d=proj.max_distance,
            nthr=cfg.inlier_normal_angular_threshold,
            dthr2=cfg.inlier_distance_threshold**2,
            cthr=cfg.flat_curvature_threshold,
            rthr=cfg.inlier_curvature_ratio_threshold,
            max_chi2=cfg.inlier_max_chi2,
            robust=cfg.robust_kernel,
            interpret=INTERPRET,
        )
        Hf, bf, chi2f, inlf = pa.unpack_sums(sums)

        mask, rp, rn = _correspondences_gather(ref, cur, invT, proj, cfg)
        Hg, bg, chi2g, inlg = _linearize_planar(mask, rp, rn, cur, invT, cfg)

        # the banded association recovers nearly all of the exact gather's
        # correspondences on a smooth scene
        assert int(inlf) >= 0.97 * int(inlg), (int(inlf), int(inlg))
        np.testing.assert_allclose(float(chi2f), float(chi2g), rtol=0.1)
        # directions of the Gauss-Newton system agree
        nb = float(jnp.linalg.norm(bg)) + 1e-9
        assert float(jnp.linalg.norm(bf - bg)) / nb < 0.1
        nH = float(jnp.linalg.norm(Hg)) + 1e-9
        assert float(jnp.linalg.norm(Hf - Hg)) / nH < 0.05

    def test_align_fused_converges(self):
        proj, ref, cur, T_gt = _scene()
        cfg = AlignerConfig(outer_iterations=6, inner_iterations=1,
                            association="fused")
        res = align(ref, cur, proj, config=cfg)
        t_err = float(jnp.linalg.norm(res.T[:3, 3] - T_gt[:3, 3]))
        assert t_err < 5e-3, t_err
        assert int(res.inliers) > 1000

    @pytest.mark.parametrize("name,xi", [
        ("small_mixed", [0.02, -0.01, 0.03, 0.01, -0.008, 0.006]),
        ("translation_fwd", [0.0, 0.0, 0.12, 0.0, 0.0, 0.0]),
        ("rotation_yaw_5deg", [0.0, 0.0, 0.0, 0.0, 0.087, 0.0]),
        ("rotation_roll_5deg", [0.0, 0.0, 0.0, 0.0, 0.0, 0.087]),
        ("rotation_pitch_4deg_parallax", [0.0, 0.05, 0.0, 0.07, 0.0, 0.0]),
    ])
    def test_recall_across_motion_sweep(self, name, xi):
        """Round-2 VERDICT item 6: the banded association's recall vs the
        exact gather must stay >= 99% across the motion envelope the tracker
        actually sees (a keyframe is cut when the inlier fraction drops, so
        per-frame motion stays small) — and whenever recall DOES drop, the
        band_coverage diagnostic must flag it so the tracker's documented
        gather fallback fires."""
        proj, ref, cur0, _ = _scene()
        cfg = AlignerConfig()
        xi = jnp.asarray(xi, jnp.float32)
        T = np.asarray(lie.se3_v2t(xi))
        from g2o_frontend_tpu.utils.synth import render_planes_depth
        from g2o_frontend_tpu.pwn.converter import depth_to_cloud
        ccfg = ConverterConfig(min_image_radius=3, max_image_radius=8,
                               min_points=12)
        cur = depth_to_cloud(render_planes_depth(T, proj), proj, ccfg)
        invT = jnp.asarray(np.linalg.inv(T), jnp.float32)

        cur_p, ref_p = pa.prepare_fused_inputs(
            ref, cur, TR=cfg.tile_rows, TC=cfg.tile_cols,
            DV=cfg.band_dv, DU=cfg.band_du)
        kw = dict(
            H=proj.rows, W=proj.cols,
            TR=cfg.tile_rows, TC=cfg.tile_cols,
            DV=cfg.band_dv, DU=cfg.band_du,
            fx=proj.fx, fy=proj.fy, cx=proj.cx, cy=proj.cy,
            min_d=proj.min_distance, max_d=proj.max_distance)
        sums = pa.fused_linearize(
            cur_p, ref_p, pa.params_from_invT(invT),
            nthr=cfg.inlier_normal_angular_threshold,
            dthr2=cfg.inlier_distance_threshold**2,
            cthr=cfg.flat_curvature_threshold,
            rthr=cfg.inlier_curvature_ratio_threshold,
            max_chi2=cfg.inlier_max_chi2,
            robust=cfg.robust_kernel, interpret=INTERPRET, **kw)
        _, _, _, inl_f = pa.unpack_sums(sums)
        mask, rp, rn = _correspondences_gather(ref, cur, invT, proj, cfg)
        _, _, _, inl_g = _linearize_planar(mask, rp, rn, cur, invT, cfg)
        recall = float(inl_f) / max(float(inl_g), 1.0)
        coverage = float(pa.fused_band_coverage(
            cur_p, pa.params_from_invT(invT), **kw))
        assert recall >= 0.99 or coverage < 0.99, (
            f"{name}: recall {recall:.4f} with coverage {coverage:.4f} -- "
            "silent correspondence loss (coverage must flag low recall)")

    def test_coverage_flags_band_blowout(self):
        """A rotation far past the keyframe gate must drive band_coverage
        visibly below 1 (the tracker then falls back to the exact gather)."""
        proj, ref, _, _ = _scene()
        cfg = AlignerConfig()
        from g2o_frontend_tpu.utils.synth import render_planes_depth
        from g2o_frontend_tpu.pwn.converter import depth_to_cloud
        ccfg = ConverterConfig(min_image_radius=3, max_image_radius=8,
                               min_points=12)
        # 20 degrees of roll: in-tile displacement spread >> (DV, DU)
        xi = jnp.asarray([0.0, 0.0, 0.0, 0.0, 0.0, 0.35], jnp.float32)
        T = np.asarray(lie.se3_v2t(xi))
        cur = depth_to_cloud(render_planes_depth(T, proj), proj, ccfg)
        cur_p, _ = pa.prepare_fused_inputs(
            ref, cur, TR=cfg.tile_rows, TC=cfg.tile_cols,
            DV=cfg.band_dv, DU=cfg.band_du)
        cov = float(pa.fused_band_coverage(
            cur_p, pa.params_from_invT(
                jnp.asarray(np.linalg.inv(T), jnp.float32)),
            H=proj.rows, W=proj.cols, TR=cfg.tile_rows, TC=cfg.tile_cols,
            DV=cfg.band_dv, DU=cfg.band_du,
            fx=proj.fx, fy=proj.fy, cx=proj.cx, cy=proj.cy,
            min_d=proj.min_distance, max_d=proj.max_distance))
        assert cov < 0.98, cov

    def test_batched_kernel_matches_per_pair(self):
        """fused_linearize_batch((K, gR, gC) grid) must reproduce K separate
        fused_linearize calls bit-for-bit-ish — the closer's batched
        candidate matching runs through it with NO gather fallback
        (round-2 VERDICT item 4)."""
        proj, ref, cur, T_gt = _scene()
        cfg = AlignerConfig()
        # K candidates: the same reference under different guesses + a
        # slightly perturbed reference cloud
        invTs = jnp.stack([
            jnp.eye(4, dtype=jnp.float32),
            jnp.asarray(np.linalg.inv(T_gt), jnp.float32),
            jnp.asarray(
                lie.se3_v2t(jnp.asarray([0.01, 0.0, -0.01, 0.0, 0.005, 0.0],
                                        jnp.float32)), jnp.float32),
        ])
        K = invTs.shape[0]
        import jax.tree_util as jtu
        refs = jtu.tree_map(lambda x: jnp.stack([x] * K), ref)

        kw = dict(
            H=proj.rows, W=proj.cols,
            TR=cfg.tile_rows, TC=cfg.tile_cols,
            DV=cfg.band_dv, DU=cfg.band_du,
            fx=proj.fx, fy=proj.fy, cx=proj.cx, cy=proj.cy,
            min_d=proj.min_distance, max_d=proj.max_distance,
            nthr=cfg.inlier_normal_angular_threshold,
            dthr2=cfg.inlier_distance_threshold**2,
            cthr=cfg.flat_curvature_threshold,
            rthr=cfg.inlier_curvature_ratio_threshold,
            max_chi2=cfg.inlier_max_chi2,
            robust=cfg.robust_kernel,
            interpret=INTERPRET,
        )
        cur_p, ref_ps = pa.prepare_fused_batch(
            refs, cur, TR=cfg.tile_rows, TC=cfg.tile_cols,
            DV=cfg.band_dv, DU=cfg.band_du)
        prms = jnp.concatenate(
            [pa.params_from_invT(t) for t in invTs], axis=0)
        sums_b = pa.fused_linearize_batch(cur_p, ref_ps, prms, **kw)
        for k in range(K):
            cur_p1, ref_p1 = pa.prepare_fused_inputs(
                ref, cur, TR=cfg.tile_rows, TC=cfg.tile_cols,
                DV=cfg.band_dv, DU=cfg.band_du)
            sums_1 = pa.fused_linearize(
                cur_p1, ref_p1, pa.params_from_invT(invTs[k]), **kw)
            np.testing.assert_allclose(
                np.asarray(sums_b[k]), np.asarray(sums_1),
                rtol=2e-5, atol=1e-3)

    def test_align_batch_matches_align(self):
        """align_batch (fused) end-to-end vs per-pair align on K=2."""
        proj, ref, cur, T_gt = _scene()
        cfg = AlignerConfig(outer_iterations=4, inner_iterations=1,
                            association="fused")
        import jax.tree_util as jtu
        refs = jtu.tree_map(lambda x: jnp.stack([x, x]), ref)
        guesses = jnp.stack([jnp.eye(4, dtype=jnp.float32),
                             jnp.asarray(T_gt, jnp.float32)])
        from g2o_frontend_tpu.pwn.aligner import align_batch
        res_b = align_batch(refs, cur, proj, guesses, cfg)
        for k in range(2):
            res_1 = align(ref, cur, proj, initial_guess=guesses[k], config=cfg)
            np.testing.assert_allclose(np.asarray(res_b.T[k]),
                                       np.asarray(res_1.T),
                                       rtol=1e-4, atol=1e-5)
            assert int(res_b.inliers[k]) == int(res_1.inliers)
