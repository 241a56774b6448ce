"""Prototype: banded one-hot projective association (jnp reference version).

Validates that a (2DV+1)x(2DU+1) banded select reproduces the XLA-gather
association exactly for pixels whose integer displacement fits the window,
on the bench scene, and counts how many fall outside.
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp

jax.config.update("jax_platforms", "cpu")

from bench import _make_depth_pair
from g2o_frontend_tpu.pwn.aligner import (
    AlignerConfig, _correspondences_gather, _linearize_planar, _pixel_of_planar)
from g2o_frontend_tpu.ops import sym6
from g2o_frontend_tpu.pwn.converter import ConverterConfig, depth_to_cloud
from g2o_frontend_tpu.utils import lie

H, W = 480, 640
d_ref, d_cur, proj, T_gt = _make_depth_pair(H, W)
cfg = AlignerConfig()
ref = depth_to_cloud(d_ref, proj, ConverterConfig())
cur = depth_to_cloud(d_cur, proj, ConverterConfig())


def displacement_stats(invT):
    Rinv = invT[:3, :3].T
    tinv = -Rinv @ invT[:3, 3]
    cx, cy, cz = sym6.rot_apply(Rinv, (cur.p[0], cur.p[1], cur.p[2]))
    cx, cy, cz = cx + tinv[0], cy + tinv[1], cz + tinv[2]
    u, v, d = _pixel_of_planar(proj, cx, cy, cz)
    ui = jnp.round(u).astype(jnp.int32)
    vi = jnp.round(v).astype(jnp.int32)
    us = jnp.arange(W)[None, :].astype(jnp.int32)
    vs = jnp.arange(H)[:, None].astype(jnp.int32)
    du = ui - us
    dv = vi - vs
    ok = cur.valid & (d > proj.min_distance) & (ui >= 0) & (ui < W) & (vi >= 0) & (vi < H)
    du_v = np.asarray(du)[np.asarray(ok)]
    dv_v = np.asarray(dv)[np.asarray(ok)]
    print(f"du: [{du_v.min()}, {du_v.max()}] p99 |du|={np.percentile(np.abs(du_v),99):.1f}; "
          f"dv: [{dv_v.min()}, {dv_v.max()}] p99 |dv|={np.percentile(np.abs(dv_v),99):.1f}")
    return du, dv, ok


# at identity guess (worst case: full inter-frame motion)
I4 = jnp.eye(4, dtype=jnp.float32)
print("identity guess:")
displacement_stats(I4)
# at ground truth (residual displacement only)
print("at ground-truth transform (invT = T_gt^-1 ... i.e. converged):")
displacement_stats(jnp.asarray(np.linalg.inv(T_gt), jnp.float32))


def correspondences_banded(ref, cur, invT, projector, cfg, DV=8, DU=12):
    """Banded one-hot twin of _correspondences_gather."""
    Rinv = invT[:3, :3].T
    tinv = -Rinv @ invT[:3, 3]
    px, py, pz = sym6.rot_apply(Rinv, (cur.p[0], cur.p[1], cur.p[2]))
    px, py, pz = px + tinv[0], py + tinv[1], pz + tinv[2]
    u, v, d = _pixel_of_planar(projector, px, py, pz)
    ui = jnp.round(u).astype(jnp.int32)
    vi = jnp.round(v).astype(jnp.int32)
    Hh, Ww = projector.rows, projector.cols
    us = jnp.arange(Ww)[None, :].astype(jnp.int32)
    vs = jnp.arange(Hh)[:, None].astype(jnp.int32)
    du = ui - us
    dv = vi - vs
    inside = (
        cur.valid
        & (d > projector.min_distance)
        & (d < projector.max_distance)
        & (ui >= 0) & (ui < Ww) & (vi >= 0) & (vi < Hh)
        & (jnp.abs(du) <= DU) & (jnp.abs(dv) <= DV)
    )
    # ref table: 8 channels [p(3), n(3), curv, valid] padded by (DV, DU)
    table = jnp.concatenate(
        [ref.p, ref.n, ref.curv[None], ref.valid[None].astype(ref.p.dtype)], 0
    )
    tpad = jnp.pad(table, ((0, 0), (DV, DV), (DU, DU)))
    acc = jnp.zeros_like(table)
    for dy in range(-DV, DV + 1):
        hv = dv == dy
        for dx in range(-DU, DU + 1):
            hit = (hv & (du == dx)).astype(table.dtype)
            blk = jax.lax.dynamic_slice(
                tpad, (0, dy + DV, dx + DU), table.shape)
            acc = acc + hit[None] * blk
    rp, rn = acc[0:3], acc[3:6]
    ref_curv, ref_ok = acc[6], acc[7] > 0

    R, t = invT[:3, :3], invT[:3, 3]
    rpc = sym6.rot_apply(R, (rp[0], rp[1], rp[2]))
    rpc = (rpc[0] + t[0], rpc[1] + t[1], rpc[2] + t[2])
    rnc = sym6.rot_apply(R, (rn[0], rn[1], rn[2]))
    cur_has_n = cur.n[0] ** 2 + cur.n[1] ** 2 + cur.n[2] ** 2 > 0
    ref_has_n = rn[0] ** 2 + rn[1] ** 2 + rn[2] ** 2 > 0
    dot = cur.n[0] * rnc[0] + cur.n[1] * rnc[1] + cur.n[2] * rnc[2]
    dist2 = sum((cur.p[k] - rpc[k]) ** 2 for k in range(3))
    cthr = cfg.flat_curvature_threshold
    rc = jnp.maximum(ref_curv, cthr)
    cc = jnp.maximum(cur.curv, cthr)
    ratio = (rc + 1e-5) / (cc + 1e-5)
    mask = (
        inside & ref_ok & cur_has_n & ref_has_n
        & (dot >= cfg.inlier_normal_angular_threshold)
        & (dist2 <= cfg.inlier_distance_threshold**2)
        & (ratio >= 1.0 / cfg.inlier_curvature_ratio_threshold)
        & (ratio <= cfg.inlier_curvature_ratio_threshold)
    )
    return mask, rp, rn


for name, invT in [("identity", I4),
                   ("converged", jnp.asarray(np.linalg.inv(T_gt), jnp.float32))]:
    m0, rp0, rn0 = jax.jit(
        lambda t: _correspondences_gather(ref, cur, t, proj, cfg))(invT)
    m1, rp1, rn1 = jax.jit(
        lambda t: correspondences_banded(ref, cur, t, proj, cfg, DV=8, DU=12))(invT)
    m0n, m1n = np.asarray(m0), np.asarray(m1)
    both = m0n & m1n
    dp = np.abs(np.asarray(rp0) - np.asarray(rp1))[:, both].max() if both.any() else 0
    H0, b0, c0, i0 = jax.jit(
        lambda m, p, n, t: _linearize_planar(m, p, n, cur, t, cfg))(m0, rp0, rn0, invT)
    H1, b1, c1, i1 = jax.jit(
        lambda m, p, n, t: _linearize_planar(m, p, n, cur, t, cfg))(m1, rp1, rn1, invT)
    print(f"{name}: gather inliers={m0n.sum()}, banded={m1n.sum()}, "
          f"agree={both.sum()}, max|ref_pt diff| on common={dp:.2e}")
    print(f"  |H diff|/|H| = {np.abs(H0-H1).max()/np.abs(np.asarray(H0)).max():.3e}, "
          f"|b diff|/|b| = {np.abs(b0-b1).max()/max(np.abs(np.asarray(b0)).max(),1e-9):.3e}")
