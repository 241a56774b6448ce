"""Dev check: fused Pallas aligner kernel vs the jnp gather path (CPU interpret)."""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp

if os.environ.get("ON_TPU") != "1":
    jax.config.update("jax_platforms", "cpu")

from bench import _make_depth_pair
from g2o_frontend_tpu.ops.pallas_aligner import (
    fused_linearize, params_from_invT, prepare_fused_inputs, unpack_sums)
from g2o_frontend_tpu.pwn.aligner import (
    AlignerConfig, _correspondences_gather, _linearize_planar)
from g2o_frontend_tpu.pwn.converter import ConverterConfig, depth_to_cloud

interpret = os.environ.get("ON_TPU") != "1"
H, W = (480, 640) if not interpret else (96, 128)
d_ref, d_cur, proj, T_gt = _make_depth_pair(H, W)
cfg = AlignerConfig()
ccfg = ConverterConfig() if H >= 240 else ConverterConfig(
    min_image_radius=3, max_image_radius=8, min_points=12)
ref = depth_to_cloud(d_ref, proj, ccfg)
cur = depth_to_cloud(d_cur, proj, ccfg)

TR = int(os.environ.get("TR", 16)); TC = int(os.environ.get("TC", 128))
DV = int(os.environ.get("DV", 3)); DU = int(os.environ.get("DU", 4))
cur_p, ref_p = prepare_fused_inputs(ref, cur, TR=TR, TC=TC, DV=DV, DU=DU)

for name, invT in [
    ("identity", jnp.eye(4, dtype=jnp.float32)),
    ("converged", jnp.asarray(np.linalg.inv(T_gt), jnp.float32)),
    ("halfway", jnp.asarray(
        np.eye(4) * 0.0 + np.linalg.inv(
            0.5 * (T_gt + np.eye(4))), jnp.float32)),
]:
    params = params_from_invT(invT)
    sums = fused_linearize(
        cur_p, ref_p, params,
        H=H, W=W, TR=TR, TC=TC, DV=DV, DU=DU,
        fx=proj.fx, fy=proj.fy, cx=proj.cx, cy=proj.cy,
        min_d=proj.min_distance, max_d=proj.max_distance,
        nthr=cfg.inlier_normal_angular_threshold,
        dthr2=cfg.inlier_distance_threshold**2,
        cthr=cfg.flat_curvature_threshold,
        rthr=cfg.inlier_curvature_ratio_threshold,
        max_chi2=cfg.inlier_max_chi2,
        robust=True, interpret=interpret,
    )
    Hm1, b1, chi1, inl1 = unpack_sums(sums)

    m0, rp0, rn0 = jax.jit(
        lambda t: _correspondences_gather(ref, cur, t, proj, cfg))(invT)
    Hm0, b0, chi0, inl0 = jax.jit(
        lambda m, p, n, t: _linearize_planar(m, p, n, cur, t, cfg))(
            m0, rp0, rn0, invT)
    Hm0, b0 = np.asarray(Hm0), np.asarray(b0)
    Hm1, b1 = np.asarray(Hm1), np.asarray(b1)
    print(f"{name}: inliers gather={int(inl0)} fused={int(inl1)}  "
          f"relHdiff={np.abs(Hm0-Hm1).max()/max(np.abs(Hm0).max(),1e-9):.2e}  "
          f"relbdiff={np.abs(b0-b1).max()/max(np.abs(b0).max(),1e-9):.2e}  "
          f"chi {float(chi0):.4g}/{float(chi1):.4g}")
print("OK")
