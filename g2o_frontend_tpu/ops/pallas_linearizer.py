"""Pallas TPU kernel: fused PWN H/b accumulation (the CUDA kernel's analog).

This is the direct TPU counterpart of the reference's fused GPU kernel
``Aligner_coolIterationKernel`` (``pwn_cuda/cudaaligner.cu:361-406``): one
pass over all pixels computing the gated point+normal residuals, the robust
scale, and the per-pixel contributions to the 6x6 Gauss-Newton system, with
an on-chip tree reduction — replacing ~10 separate XLA einsum/reduce passes
in the jnp linearizer with a single memory sweep.

Layout: all per-pixel quantities are packed CHANNEL-PLANAR, shape (C, N)
with N = H*W padded to the lane tile — pixels ride the 128-lane dimension,
channels the sublanes, so every operation below is a pure VPU multiply-add.
Symmetric 3x3 omegas are stored as 6 unique channels.

Channel packing (input `packed`, 32 channels):
  0:3   remapped reference point p  (already R_invT @ ref + t)
  3:6   remapped reference normal n
  6:9   current point cp
  9:12  current normal cn
  12:18 omega_p (xx, xy, xz, yy, yz, zz)
  18:24 omega_n (xx, xy, xz, yy, yz, zz)
  24    mask (0/1)
Outputs per grid tile: (n_tiles, 40):
  0:6 Htt(6) | 6:15 Htr(9) | 15:21 Hrr(6) | 21:27 b | 27 chi2 | 28 inliers
summed on the host side of the call (a (n_tiles, 40) epilogue reduction).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

C_IN = 25
C_OUT = 128  # TPU lane-width padded output row (29 used)
LANE_TILE = 1024  # pixels per grid step (8 sublane rows x 128 lanes)


def _sym_apply(o, v0, v1, v2):
    """(6-channel symmetric matrix) @ (3 channels) -> 3 channels."""
    xx, xy, xz, yy, yz, zz = o
    return (
        xx * v0 + xy * v1 + xz * v2,
        xy * v0 + yy * v1 + yz * v2,
        xz * v0 + yz * v1 + zz * v2,
    )


def _linearize_kernel(inlier_max_chi2, packed_ref, out_ref):
    x = packed_ref[...]  # (C_IN, LANE_TILE)
    p = (x[0], x[1], x[2])
    n = (x[3], x[4], x[5])
    cp = (x[6], x[7], x[8])
    cn = (x[9], x[10], x[11])
    op = tuple(x[12 + k] for k in range(6))
    on = tuple(x[18 + k] for k in range(6))
    m = x[24]

    ep = (p[0] - cp[0], p[1] - cp[1], p[2] - cp[2])
    en = (n[0] - cn[0], n[1] - cn[1], n[2] - cn[2])
    wp = _sym_apply(op, *ep)
    wn = _sym_apply(on, *en)
    chi = (
        ep[0] * wp[0] + ep[1] * wp[1] + ep[2] * wp[2]
        + en[0] * wn[0] + en[1] * wn[1] + en[2] * wn[2]
    )
    kscale = jnp.where(
        chi > inlier_max_chi2,
        jnp.sqrt(inlier_max_chi2 / jnp.maximum(chi, 1e-12)),
        1.0,
    )
    mk = m * kscale

    # b_t = sum mk * wp ; b_r = sum mk * 2 (p x wp + n x wn)
    crx = p[1] * wp[2] - p[2] * wp[1] + n[1] * wn[2] - n[2] * wn[1]
    cry = p[2] * wp[0] - p[0] * wp[2] + n[2] * wn[0] - n[0] * wn[2]
    crz = p[0] * wp[1] - p[1] * wp[0] + n[0] * wn[1] - n[1] * wn[0]

    # Htr = omega_p @ S(p) with S = -2 hat(p) (the reference's skew,
    # bm_se3.h:53-65). Explicit columns of S:
    #   col0 = (0, -2 p2, 2 p1), col1 = (2 p2, 0, -2 p0), col2 = (-2 p1, 2 p0, 0)
    s0 = (jnp.zeros_like(p[0]), -2.0 * p[2], 2.0 * p[1])
    s1 = (2.0 * p[2], jnp.zeros_like(p[0]), -2.0 * p[0])
    s2 = (-2.0 * p[1], 2.0 * p[0], jnp.zeros_like(p[0]))
    c0 = _sym_apply(op, *s0)
    c1 = _sym_apply(op, *s1)
    c2 = _sym_apply(op, *s2)
    # Hrr = S(p)^T Omega_p S(p) + S(n)^T Omega_n S(n)
    t0 = (jnp.zeros_like(p[0]), -2.0 * n[2], 2.0 * n[1])
    t1 = (2.0 * n[2], jnp.zeros_like(p[0]), -2.0 * n[0])
    t2 = (-2.0 * n[1], 2.0 * n[0], jnp.zeros_like(p[0]))
    d0 = _sym_apply(on, *t0)
    d1 = _sym_apply(on, *t1)
    d2 = _sym_apply(on, *t2)

    def dot3(a, b):
        return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]

    # Hrr[i,j] = s_i . (Omega_p s_j) + t_i . (Omega_n t_j)  (symmetric)
    hrr = (
        dot3(s0, c0) + dot3(t0, d0),  # 00
        dot3(s0, c1) + dot3(t0, d1),  # 01
        dot3(s0, c2) + dot3(t0, d2),  # 02
        dot3(s1, c1) + dot3(t1, d1),  # 11
        dot3(s1, c2) + dot3(t1, d2),  # 12
        dot3(s2, c2) + dot3(t2, d2),  # 22
    )

    rows = [
        # Htt (6, unscaled omegas, reference semantics)
        m * op[0], m * op[1], m * op[2], m * op[3], m * op[4], m * op[5],
        # Htr (9): row i, col j = (omega_p S)_ij = c_j[i]
        m * c0[0], m * c1[0], m * c2[0],
        m * c0[1], m * c1[1], m * c2[1],
        m * c0[2], m * c1[2], m * c2[2],
        # Hrr (6)
        m * hrr[0], m * hrr[1], m * hrr[2], m * hrr[3], m * hrr[4], m * hrr[5],
        # b (6) with kscale
        mk * wp[0], mk * wp[1], mk * wp[2],
        2.0 * mk * crx, 2.0 * mk * cry, 2.0 * mk * crz,
        # chi2, inliers
        mk * chi, m,
    ]
    acc = jnp.stack(rows, axis=0)  # (29, LANE_TILE)
    partial_sums = jnp.sum(acc, axis=1)  # (29,)
    out = jnp.zeros((8, C_OUT), acc.dtype).at[0, :29].set(partial_sums)
    out_ref[0, :, :] = out


def pack_inputs(mask, ref_pts_cur, ref_nrm_cur, cur_points, cur_normals,
                omega_p, omega_n):
    """Image-organized fields -> (C_IN, N_padded) channel-planar array."""
    N = mask.size
    flat = lambda a: a.reshape(N, -1).T  # (C, N)
    iu = np.triu_indices(3)
    op6 = omega_p.reshape(N, 3, 3)[:, iu[0], iu[1]].T
    on6 = omega_n.reshape(N, 3, 3)[:, iu[0], iu[1]].T
    packed = jnp.concatenate(
        [
            flat(ref_pts_cur),
            flat(ref_nrm_cur),
            flat(cur_points),
            flat(cur_normals),
            op6,
            on6,
            mask.reshape(1, N).astype(ref_pts_cur.dtype),
        ],
        axis=0,
    )
    pad = (-N) % LANE_TILE
    if pad:
        packed = jnp.pad(packed, ((0, 0), (0, pad)))
    return packed


@partial(jax.jit, static_argnames=("inlier_max_chi2", "interpret"))
def linearize_pallas(packed, inlier_max_chi2: float = 9e3, interpret: bool = False):
    """Run the fused kernel; returns (H (6,6), b (6,), chi2, inliers)."""
    C, N = packed.shape
    n_tiles = N // LANE_TILE
    partials = pl.pallas_call(
        partial(_linearize_kernel, inlier_max_chi2),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((C_IN, LANE_TILE), lambda i: (0, i),
                         memory_space=pl.ANY if interpret else pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 8, C_OUT), lambda i: (i, 0, 0),
                               memory_space=pl.ANY if interpret else pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_tiles, 8, C_OUT), packed.dtype),
        interpret=interpret,
    )(packed)
    s = jnp.sum(partials[:, 0, :], axis=0)
    Htt = s[0:6]
    Htr = s[6:15].reshape(3, 3)
    Hrr = s[15:21]
    b = s[21:27]
    chi2 = s[27]
    inliers = s[28]

    def sym(v):
        return jnp.array(
            [[v[0], v[1], v[2]], [v[1], v[3], v[4]], [v[2], v[4], v[5]]],
            packed.dtype,
        )

    H = jnp.zeros((6, 6), packed.dtype)
    H = H.at[:3, :3].set(sym(Htt))
    H = H.at[:3, 3:].set(Htr)
    H = H.at[3:, :3].set(Htr.T)
    H = H.at[3:, 3:].set(sym(Hrr))
    return H, b, chi2, inliers
