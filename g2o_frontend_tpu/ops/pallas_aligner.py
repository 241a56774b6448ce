"""Fused Pallas TPU aligner iteration: association + gates + linearize.

The direct TPU counterpart of the reference's fused GPU kernel
(``pwn_cuda/cudaaligner.cu:361-406``, drop-in via ``cualigner.h:8-11``): ONE
sweep over the current image computes, per pixel,

  project -> integer correspondence -> gather ref attributes -> the four
  correspondence gates (``correspondencefinder.cpp:20-118``) -> robust
  point+normal linearization (``linearizer.cpp:17-115``) -> tile-reduced
  29 partial sums of (Htt, Htr, Hrr, b, chi2, inliers).

Why not a gather: XLA/Mosaic have no fast arbitrary gather on TPU (~3 GB/s
measured; Mosaic's dynamic_gather is single-(8,128)-tile only). Instead the
correspondence fetch is reformulated as a *per-tile dynamically offset,
banded one-hot select*:

- a (cheap, fully fused) XLA prologue projects the current points and takes
  each (TR, TC) tile's mean integer displacement as that tile's reference-
  window origin, aligned DOWN to the (8, 128) memory tiling, then
- the Pallas kernel double-buffer DMAs each tile's reference window straight
  from HBM at those scalar-prefetched dynamic offsets (so arbitrary global
  motion costs nothing), scans the window rows with static slices, and
  resolves the per-pixel column with Mosaic's in-tile lane gather
  (take_along_axis over 128-wide chunks) — no dynamic vector addressing.

The tile-aligned origins widen the effective residual window to
[0, 2*DV+8) x [0, 2*DU+128) around each tile's mean flow, which covers
depth-parallax spread within a tile (99+% correspondence recall vs the
exact gather on the bench scene). Pixels outside it lose their
correspondence exactly like a failed gate. The reference point is
reconstructed from the gathered depth and the integer target pixel —
bit-identical to the converter's unprojection
(``pinholepointprojector.cpp:69-108``).

Layouts: channel-planar f32 (see pwn/cloud.py).
  cur_packed (20, H, W):  p(0:3) n(3:6) curv(6) valid(7) op(8:14) on(14:20)
  ref_padded (5, H+2DV, W+2DU): depth, normal, curv (-1 where invalid)
  params (1, 24) f32: Rinv(0:9) tinv(9:12) R(12:21) t(21:24) where
  (Rinv, tinv) = invT^-1 maps current points into the reference camera and
  (R, t) = invT remaps reference attributes into the current frame.
Output: (29,) sums in the exact order of ``pwn.aligner._linearize_planar``.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

C_CUR = 20
C_REF = 5


def pack_cur(cloud):
    """Cloud -> (20, H, W) channel-planar."""
    dtype = cloud.p.dtype
    return jnp.concatenate(
        [
            cloud.p,
            cloud.n,
            cloud.curv[None],
            cloud.valid[None].astype(dtype),
            cloud.op,
            cloud.on,
        ],
        axis=0,
    )


def pack_ref(cloud):
    """Cloud -> (5, H, W): depth, normal, curv-or--1 (validity sentinel)."""
    dtype = cloud.p.dtype
    curv_sent = jnp.where(cloud.valid, cloud.curv, jnp.asarray(-1.0, dtype))
    return jnp.concatenate([cloud.p[2:3], cloud.n, curv_sent[None]], axis=0)


def _bf16_bits(x):
    """f32 -> round-to-nearest bf16 payload in the LOW 16 bits of an i32."""
    b = jax.lax.bitcast_convert_type(
        x.astype(jnp.bfloat16), jnp.uint16
    ).astype(jnp.uint32)
    return b


def pack_ref2(ref5):
    """(5, H, W) f32 -> (3, H, W) i32: bf16 payload pairs.

    c0 = depth | curv, c1 = nx | ny, c2 = nz | 0 (each: high 16 bits first
    member, low 16 bits second). Halves the reference DMA volume and cuts
    the kernel's banded select-gather from 5 lane gathers per (row, chunk)
    step to 3 — the dominant VPU cost (EVAL r2 roofline: 23% of HBM floor,
    VPU-bound). bf16 keeps ~3 significant digits: depth error < 2 cm at
    5 m, well under the correspondence distance gate; the curv sentinel
    (-1.0) is exact in bf16."""
    d, nx, ny, nz, cv = ref5[0], ref5[1], ref5[2], ref5[3], ref5[4]
    c0 = (_bf16_bits(d) << 16) | _bf16_bits(cv)
    c1 = (_bf16_bits(nx) << 16) | _bf16_bits(ny)
    c2 = _bf16_bits(nz) << 16
    return jnp.stack([c0, c1, c2]).astype(jnp.int32)


def _unpack_hi(u):
    """i32 -> f32 from the HIGH bf16 payload (bf16 IS the top half of f32:
    mask the low bits and bitcast — pure 32-bit ops, Mosaic-safe)."""
    return jax.lax.bitcast_convert_type(
        jnp.bitwise_and(u, jnp.int32(-65536)), jnp.float32
    )


def _unpack_lo(u):
    """i32 -> f32 from the LOW bf16 payload."""
    return jax.lax.bitcast_convert_type(
        jax.lax.shift_left(u, jnp.int32(16)), jnp.float32
    )


def _round_up(x, m):
    return -(-x // m) * m


def _project_cur(cur_packed, params, *, H, W, fx, fy, cx, cy, min_d, max_d):
    """XLA prologue: per-pixel integer target coords + validity."""
    cpx, cpy, cpz = cur_packed[0], cur_packed[1], cur_packed[2]
    cvalid = cur_packed[7] > 0
    prm = params[0]
    qx = prm[0] * cpx + prm[1] * cpy + prm[2] * cpz + prm[9]
    qy = prm[3] * cpx + prm[4] * cpy + prm[5] * cpz + prm[10]
    qz = prm[6] * cpx + prm[7] * cpy + prm[8] * cpz + prm[11]
    safe_z = jnp.where(qz == 0, 1e-9, qz)
    uf = qx / safe_z * fx + cx
    vf = qy / safe_z * fy + cy
    ui = jnp.round(uf).astype(jnp.int32)
    vi = jnp.round(vf).astype(jnp.int32)
    Hp_c, Wp_c = cur_packed.shape[1], cur_packed.shape[2]
    vglob = jax.lax.broadcasted_iota(jnp.int32, (Hp_c, Wp_c), 0)
    uglob = jax.lax.broadcasted_iota(jnp.int32, (Hp_c, Wp_c), 1)
    inside = (
        cvalid
        & (qz > min_d)
        & (qz < max_d)
        & (ui >= 0)
        & (ui < W)
        & (vi >= 0)
        & (vi < H)
        & (vglob < H)
        & (uglob < W)
    )
    return ui, vi, inside, vglob, uglob


def _dma_block_shape(TR, TC, DV, DU):
    """Reference-window DMA block: starts align DOWN to the (8, 128) memory
    tiling (Mosaic requires provably tile-aligned DMA offsets), so the block
    is widened by one tile in each dim to absorb the alignment slack, then
    rounded up to whole tiles."""
    return (
        _round_up(TR + 2 * DV + 8, 8),
        _round_up(TC + 2 * DU + 128, 128),
    )


def _padded_ref_shape(H, W, TR, TC, DV, DU):
    BR, BC = _dma_block_shape(TR, TC, DV, DU)
    Hpad = _round_up(max(H + 2 * DV, BR) + 8, 8)
    Wpad = _round_up(max(W + 2 * DU, BC) + 128, 128)
    return Hpad, Wpad


def _tile_starts(ui, vi, inside, vglob, uglob, *, TR, TC, DV, DU, H, W):
    """Per-tile clamped, tile-ALIGNED reference-window starts PLUS the
    active row/chunk bounds: (gR*gC, 6) i32 rows of
    [vstart, ustart, row_lo, row_hi, chunk_lo, chunk_hi].

    The bounds are the min/max residual window row (of the BR-TR candidate
    rows) and 128-lane chunk (of the BC/TC candidates) actually hit by any
    valid pixel of the tile — the kernel skips the rest with `pl.when`.
    Typical scenes concentrate a tile's correspondences in a few rows and
    two chunks, cutting the select-gather work ~4-6x vs the full sweep.
    An empty tile gets lo=1 > hi=0 (nothing executes)."""
    Hp_c, Wp_c = ui.shape
    gR, gC = Hp_c // TR, Wp_c // TC
    insf = inside.astype(jnp.float32)

    def tile_mean(x):
        x4 = (x.astype(jnp.float32) * insf).reshape(gR, TR, gC, TC)
        return x4.sum((1, 3))

    cnt = jnp.maximum(insf.reshape(gR, TR, gC, TC).sum((1, 3)), 1.0)
    ovf = tile_mean(vi - vglob) / cnt
    ouf = tile_mean(ui - uglob) / cnt
    ov = jnp.floor(ovf + 0.5).astype(jnp.int32)
    ou = jnp.floor(ouf + 0.5).astype(jnp.int32)
    row0 = (jnp.arange(gR, dtype=jnp.int32) * TR)[:, None]
    col0 = (jnp.arange(gC, dtype=jnp.int32) * TC)[None, :]
    BR, BC = _dma_block_shape(TR, TC, DV, DU)
    Hpad, Wpad = _padded_ref_shape(H, W, TR, TC, DV, DU)
    vstart = jnp.clip((row0 + ov) & ~7, 0, Hpad - BR)
    ustart = jnp.clip((col0 + ou) & ~127, 0, Wpad - BC)

    # per-pixel residual row/column inside the tile's DMA block — the same
    # formulas the kernel evaluates (rdv/rdu there), tiled host-graph-side
    def tile4(x):
        return x.reshape(gR, TR, gC, TC)

    rdv = tile4(vi + DV - vglob) - (vstart - row0)[:, None, :, None]
    rdu = tile4(ui + DU - uglob) - (ustart - col0)[:, None, :, None]
    local_c = tile4(uglob) - col0.reshape(1, 1, gC, 1)
    n_rows = BR - TR
    n_chunks = BC // TC
    r_ok = (rdv >= 0) & (rdv < n_rows)
    u_ok = (rdu >= 0) & (rdu <= 2 * DU + 127)
    m = tile4(inside) & r_ok & u_ok
    BIG = jnp.int32(1 << 20)
    rlo = jnp.min(jnp.where(m, rdv, BIG), (1, 3))
    rhi = jnp.max(jnp.where(m, rdv, -BIG), (1, 3))
    chunk = jnp.clip(local_c + rdu, 0, BC - 1) // TC
    klo = jnp.min(jnp.where(m, chunk, BIG), (1, 3))
    khi = jnp.max(jnp.where(m, chunk, -BIG), (1, 3))
    empty = ~jnp.any(m, (1, 3))
    one = jnp.ones_like(rlo)
    rlo = jnp.where(empty, one, jnp.clip(rlo, 0, n_rows - 1))
    rhi = jnp.where(empty, 0, jnp.clip(rhi, 0, n_rows - 1))
    klo = jnp.where(empty, one, jnp.clip(klo, 0, n_chunks - 1))
    khi = jnp.where(empty, 0, jnp.clip(khi, 0, n_chunks - 1))
    return jnp.stack(
        [vstart, ustart, rlo, rhi, klo, khi], axis=-1
    ).reshape(gR * gC, 6)


def _kernel(
    params_ref,
    start_ref,
    cur_ref,
    ref_hbm,
    out_ref,
    blkbuf,
    acc_ref,
    sems,
    *,
    TR,
    TC,
    DV,
    DU,
    H,
    W,
    fx,
    fy,
    cx,
    cy,
    min_d,
    max_d,
    nthr,
    dthr2,
    cthr,
    rthr,
    max_chi2,
    robust,
    packed=True,
):
    i = pl.program_id(0)
    j = pl.program_id(1)
    gC = pl.num_programs(1)
    n_tiles = pl.num_programs(0) * gC
    t = i * gC + j
    BR, BC = _dma_block_shape(TR, TC, DV, DU)

    # double-buffered DMA of this/next tile's reference window straight from
    # HBM at the prefetched dynamic offsets (replaces an XLA block gather
    # that cost 0.3 ms/iteration)
    def blk_dma(tile, slot):
        vs = pl.multiple_of(start_ref[tile, 0], 8)
        us = pl.multiple_of(start_ref[tile, 1], 128)
        return pltpu.make_async_copy(
            ref_hbm.at[:, pl.ds(vs, BR), pl.ds(us, BC)],
            blkbuf.at[slot],
            sems.at[slot],
        )

    @pl.when(t == 0)
    def _():
        blk_dma(0, 0).start()

    @pl.when(t + 1 < n_tiles)
    def _():
        blk_dma(t + 1, (t + 1) % 2).start()

    _kernel_body(
        params_ref, start_ref, cur_ref, out_ref, blkbuf, acc_ref, sems,
        prm_row=0, t=t, i=i, j=j, first=t == 0,
        wait=blk_dma(t, t % 2).wait,
        TR=TR, TC=TC, DV=DV, DU=DU, H=H, W=W,
        fx=fx, fy=fy, cx=cx, cy=cy, min_d=min_d, max_d=max_d,
        nthr=nthr, dthr2=dthr2, cthr=cthr, rthr=rthr,
        max_chi2=max_chi2, robust=robust, packed=packed,
    )


def _kernel_body(
    params_ref,
    start_ref,
    cur_ref,
    out_ref,
    blkbuf,
    acc_ref,
    sems,
    *,
    prm_row,
    t,
    i,
    j,
    first,
    wait,
    TR,
    TC,
    DV,
    DU,
    H,
    W,
    fx,
    fy,
    cx,
    cy,
    min_d,
    max_d,
    nthr,
    dthr2,
    cthr,
    rthr,
    max_chi2,
    robust,
    packed=True,
):
    """Shared tile body of the single-pair and batched kernels: association,
    gates, robust linearization, 29-sum tile reduce."""
    row0 = i * TR
    col0 = j * TC
    f32 = jnp.float32
    BR, BC = _dma_block_shape(TR, TC, DV, DU)

    prm = [params_ref[prm_row, k] for k in range(24)]  # SMEM scalar loads
    vstart = start_ref[t, 0]
    ustart = start_ref[t, 1]

    x = cur_ref[0]  # (C_CUR, TR, TC)
    cpx, cpy, cpz = x[0], x[1], x[2]
    cnx, cny, cnz = x[3], x[4], x[5]
    ccurv = x[6]
    cvalid = x[7] > 0
    op = tuple(x[8 + k] for k in range(6))
    on = tuple(x[14 + k] for k in range(6))

    # -- project current points into the reference camera (same formula as
    #    the XLA prologue so the tile offsets are consistent) ----------------
    qx = prm[0] * cpx + prm[1] * cpy + prm[2] * cpz + prm[9]
    qy = prm[3] * cpx + prm[4] * cpy + prm[5] * cpz + prm[10]
    qz = prm[6] * cpx + prm[7] * cpy + prm[8] * cpz + prm[11]
    safe_z = jnp.where(qz == 0, f32(1e-9), qz)
    uf = qx / safe_z * f32(fx) + f32(cx)
    vf = qy / safe_z * f32(fy) + f32(cy)
    ui = jnp.round(uf).astype(jnp.int32)
    vi = jnp.round(vf).astype(jnp.int32)
    iota_r = jax.lax.broadcasted_iota(jnp.int32, (TR, TC), 0)
    iota_c = jax.lax.broadcasted_iota(jnp.int32, (TR, TC), 1)
    inside = (
        cvalid
        & (qz > f32(min_d))
        & (qz < f32(max_d))
        & (ui >= 0)
        & (ui < W)
        & (vi >= 0)
        & (vi < H)
        & (row0 + iota_r < H)
        & (col0 + iota_c < W)
    )

    # per-pixel residual target within the tile's DMA'd ref block: vstart/
    # ustart are tile-ALIGNED, so residuals carry the alignment slack
    # (vertical in [0, 2*DV+7+pad], horizontal in [0, 2*DU+127])
    rdv = vi + DV - vstart - iota_r
    rdu = ui + DU - ustart - iota_c

    # Vertical: static unroll over the BR-TR candidate rows (compile-time
    # constant slices only — dynamic sublane addressing is either rejected
    # by Mosaic (non-multiple-of-8 pl.ds) or compiles pathologically slowly),
    # with each row gated by the tile's prefetched [row_lo, row_hi] bounds —
    # inactive rows cost one scalar compare.
    # Horizontal: Mosaic's in-tile lane gather (take_along_axis on a
    # (TR, 128) tile) replaces shift-selects with BC/128 chunked gathers
    # (requires TC == 128, enforced by fused_linearize), each gated by the
    # tile's [chunk_lo, chunk_hi] bounds.
    n_chunks = BC // TC
    rlo = start_ref[t, 2]
    rhi = start_ref[t, 3]
    klo = start_ref[t, 4]
    khi = start_ref[t, 5]
    ru_ok = (rdu >= 0) & (rdu <= 2 * DU + 127)
    bc = iota_c + rdu  # target block column in [0, BC)
    bc_cl = jnp.clip(bc, 0, BC - 1)
    chunk_of = bc_cl // TC
    idx_in = bc_cl - chunk_of * TC
    acc_ref[...] = jnp.zeros_like(acc_ref)
    wait()
    blk0 = blkbuf[t % 2]  # packed: (3, BR, BC) i32; else (C_REF, BR, BC) f32
    if packed:
        # bf16-pair payloads: 3 int gathers + select-accumulate per
        # (row, chunk) step instead of 5 f32 gathers + 6 f32 FMAs — exactly
        # one (dy, k) selects per pixel, so integer adds reconstruct the
        # gathered words exactly; decode once after the sweep
        for dy in range(BR - TR):

            @pl.when((dy >= rlo) & (dy <= rhi))
            def _(dy=dy):
                hm = (rdv == dy) & ru_ok
                sub = blk0[:, dy : dy + TR, :]
                for k in range(n_chunks):

                    @pl.when((k >= klo) & (k <= khi))
                    def _(k=k, sub=sub, hm=hm):
                        selb = hm & (chunk_of == k)
                        for ch in range(3):
                            g = jnp.take_along_axis(
                                sub[ch][:, k * TC : (k + 1) * TC], idx_in,
                                axis=1,
                            )
                            acc_ref[ch] += jnp.where(selb, g, 0)
                        acc_ref[3] += selb.astype(jnp.int32)

        accd = _unpack_hi(acc_ref[0])
        accc = _unpack_lo(acc_ref[0])
        accnx = _unpack_hi(acc_ref[1])
        accny = _unpack_lo(acc_ref[1])
        accnz = _unpack_hi(acc_ref[2])
        acch = acc_ref[3].astype(f32)
        # unselected pixels decode to curv 0 (not the -1 sentinel); acch == 0
        # masks them exactly like the f32 path's zero accumulators
    else:
        for dy in range(BR - TR):

            @pl.when((dy >= rlo) & (dy <= rhi))
            def _(dy=dy):
                hf = ((rdv == dy) & ru_ok).astype(f32)
                sub = blk0[:, dy : dy + TR, :]
                for k in range(n_chunks):

                    @pl.when((k >= klo) & (k <= khi))
                    def _(k=k, sub=sub, hf=hf):
                        sel = hf * (chunk_of == k).astype(f32)
                        for ch in range(C_REF):
                            g = jnp.take_along_axis(
                                sub[ch][:, k * TC : (k + 1) * TC], idx_in,
                                axis=1,
                            )
                            acc_ref[ch] += sel * g
                        acc_ref[C_REF] += sel

        accd, accnx, accny, accnz, accc, acch = (
            acc_ref[c] for c in range(6)
        )

    # -- reconstruct the reference point from depth + integer pixel ----------
    uif = ui.astype(f32)
    vif = vi.astype(f32)
    rpx = (uif - f32(cx)) / f32(fx) * accd
    rpy = (vif - f32(cy)) / f32(fy) * accd
    rpz = accd

    # -- gates (correspondencefinder.cpp:60-103), in the current frame -------
    px = prm[12] * rpx + prm[13] * rpy + prm[14] * rpz + prm[21]
    py = prm[15] * rpx + prm[16] * rpy + prm[17] * rpz + prm[22]
    pz = prm[18] * rpx + prm[19] * rpy + prm[20] * rpz + prm[23]
    nx = prm[12] * accnx + prm[13] * accny + prm[14] * accnz
    ny = prm[15] * accnx + prm[16] * accny + prm[17] * accnz
    nz = prm[18] * accnx + prm[19] * accny + prm[20] * accnz

    ref_ok = (acch > 0) & (accc >= 0)
    cur_has_n = cnx * cnx + cny * cny + cnz * cnz > 0
    ref_has_n = accnx * accnx + accny * accny + accnz * accnz > 0
    dot = cnx * nx + cny * ny + cnz * nz
    dist2 = (cpx - px) ** 2 + (cpy - py) ** 2 + (cpz - pz) ** 2
    rc = jnp.maximum(accc, f32(cthr))
    cc = jnp.maximum(ccurv, f32(cthr))
    ratio = (rc + f32(1e-5)) / (cc + f32(1e-5))
    mask = (
        inside
        & ref_ok
        & cur_has_n
        & ref_has_n
        & (dot >= f32(nthr))
        & (dist2 <= f32(dthr2))
        & (ratio >= f32(1.0 / rthr))
        & (ratio <= f32(rthr))
    )

    # -- linearize (mirror of _linearize_planar) ------------------------------
    ep = (px - cpx, py - cpy, pz - cpz)
    en = (nx - cnx, ny - cny, nz - cnz)

    def sym_apply(o, v):
        return (
            o[0] * v[0] + o[1] * v[1] + o[2] * v[2],
            o[1] * v[0] + o[3] * v[1] + o[4] * v[2],
            o[2] * v[0] + o[4] * v[1] + o[5] * v[2],
        )

    wp = sym_apply(op, ep)
    wn = sym_apply(on, en)
    local_chi2 = (
        ep[0] * wp[0] + ep[1] * wp[1] + ep[2] * wp[2]
        + en[0] * wn[0] + en[1] * wn[1] + en[2] * wn[2]
    )
    if robust:
        kscale = jnp.where(
            local_chi2 > f32(max_chi2),
            jnp.sqrt(f32(max_chi2) / jnp.maximum(local_chi2, f32(1e-12))),
            f32(1.0),
        )
    else:
        mask = mask & (local_chi2 <= f32(max_chi2))
        kscale = jnp.ones_like(local_chi2)
    m = mask.astype(f32)
    mk = m * kscale

    z = jnp.zeros_like(px)
    s = [(z, -2 * pz, 2 * py), (2 * pz, z, -2 * px), (-2 * py, 2 * px, z)]
    tn = [(z, -2 * nz, 2 * ny), (2 * nz, z, -2 * nx), (-2 * ny, 2 * nx, z)]
    c = [sym_apply(op, sj) for sj in s]
    d = [sym_apply(on, tj) for tj in tn]

    def dot3(a, b):
        return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]

    rows = []
    rows += [m * ch for ch in op]  # Htt upper triangle (6)
    rows += [m * c[jx][ix] for ix in range(3) for jx in range(3)]  # Htr (9)
    rows += [
        m * (dot3(s[ix], c[jx]) + dot3(tn[ix], d[jx]))
        for ix in range(3)
        for jx in range(ix, 3)
    ]  # Hrr upper triangle (6)
    rows += [mk * wp[k] for k in range(3)]  # b_t
    crx = py * wp[2] - pz * wp[1] + ny * wn[2] - nz * wn[1]
    cry = pz * wp[0] - px * wp[2] + nz * wn[0] - nx * wn[2]
    crz = px * wp[1] - py * wp[0] + nx * wn[1] - ny * wn[0]
    rows += [2 * mk * crx, 2 * mk * cry, 2 * mk * crz]  # b_r
    rows += [mk * local_chi2, m]

    sums = jnp.stack([jnp.sum(r) for r in rows])  # (29,)
    row0_out = jnp.pad(sums, (0, 128 - 29))  # scatter-free (8, 128) build
    out = jnp.concatenate([row0_out[None], jnp.zeros((7, 128), f32)], axis=0)

    @pl.when(first)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    # single kernel's out block is (8, 128); the batched one's is (1, 8, 128)
    out_ref[...] += out.reshape(out_ref.shape)


@partial(
    jax.jit,
    static_argnames=(
        "H", "W", "TR", "TC", "DV", "DU",
        "fx", "fy", "cx", "cy", "min_d", "max_d",
        "nthr", "dthr2", "cthr", "rthr", "max_chi2", "robust", "interpret",
    ),
)
def fused_linearize(
    cur_packed,
    ref_padded,
    params,
    *,
    H,
    W,
    TR=16,
    TC=128,
    DV=4,
    DU=6,
    fx, fy, cx, cy, min_d, max_d,
    nthr, dthr2, cthr, rthr, max_chi2,
    robust=True,
    interpret=False,
):
    """One fused aligner iteration's reductions.

    cur_packed: (20, Hp, Wp) with Hp/Wp multiples of TR/TC (zero-padded).
    ref_padded: (5, H + 2*DV, W + 2*DU).
    params: (1, 24) f32 (see module docstring).
    Returns sums (29,) in _linearize_planar order.
    """
    if TC != 128:
        raise ValueError("fused_linearize requires TC == 128 (lane gather)")
    packed = ref_padded.dtype == jnp.int32
    Hp_c, Wp_c = cur_packed.shape[1], cur_packed.shape[2]
    gR, gC = Hp_c // TR, Wp_c // TC

    ui, vi, inside, vglob, uglob = _project_cur(
        cur_packed, params, H=H, W=W, fx=fx, fy=fy, cx=cx, cy=cy,
        min_d=min_d, max_d=max_d,
    )
    starts = _tile_starts(
        ui, vi, inside, vglob, uglob, TR=TR, TC=TC, DV=DV, DU=DU, H=H, W=W
    )

    kern = partial(
        _kernel,
        TR=TR, TC=TC, DV=DV, DU=DU, H=H, W=W,
        fx=fx, fy=fy, cx=cx, cy=cy, min_d=min_d, max_d=max_d,
        nthr=nthr, dthr2=dthr2, cthr=cthr, rthr=rthr,
        max_chi2=max_chi2, robust=robust, packed=packed,
    )
    BR, BC = _dma_block_shape(TR, TC, DV, DU)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # params (1, 24) f32, starts (gR*gC, 6) i32
        grid=(gR, gC),
        in_specs=[
            pl.BlockSpec((1, C_CUR, TR, TC), lambda i, j, *_: (0, 0, i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # full ref, DMA'd in-kernel
        ],
        out_specs=pl.BlockSpec((8, 128), lambda i, j, *_: (0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=_scratch_shapes(packed, BR, BC, TR, TC),
    )
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        interpret=interpret,
    )(params, starts.astype(jnp.int32), cur_packed[None], ref_padded)
    return out[0, :29]


def _scratch_shapes(packed, BR, BC, TR, TC):
    """Double-buffered reference window + select accumulators; the packed
    path carries 3 i32 bf16-pair planes (pack_ref2) + an i32 hit counter."""
    if packed:
        return [
            pltpu.VMEM((2, 3, BR, BC), jnp.int32),
            pltpu.VMEM((4, TR, TC), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ]
    return [
        pltpu.VMEM((2, C_REF, BR, BC), jnp.float32),
        pltpu.VMEM((C_REF + 1, TR, TC), jnp.float32),
        pltpu.SemaphoreType.DMA((2,)),
    ]


@partial(
    jax.jit,
    static_argnames=(
        "H", "W", "TR", "TC", "DV", "DU",
        "fx", "fy", "cx", "cy", "min_d", "max_d",
        "nthr", "dthr2", "cthr", "rthr", "max_chi2", "robust", "interpret",
    ),
)
def fused_linearize_batch(
    cur_packed,
    ref_padded_k,
    params_k,
    *,
    H,
    W,
    TR=16,
    TC=128,
    DV=4,
    DU=6,
    fx, fy, cx, cy, min_d, max_d,
    nthr, dthr2, cthr, rthr, max_chi2,
    robust=True,
    interpret=False,
):
    """K fused aligner iterations against ONE shared current cloud.

    The closer's batched candidate matching (``pwn_closer.cpp:92-110`` done
    as one program): grid (K, gR, gC), the shared current tile streams once
    per (i, j) while each candidate's reference window is DMA'd at its own
    prefetched per-tile offsets. `pallas_call` with scalar prefetch + manual
    DMA has no vmap rule, so the batch dimension is an explicit leading grid
    axis instead.

    cur_packed: (20, Hp, Wp) — SHARED current cloud.
    ref_padded_k: (K, 3, Hpad, Wpad) i32 bf16-pair planes (default) or
      (K, 5, Hpad, Wpad) f32 per-candidate padded references.
    params_k: (K, 24) f32 — per-candidate [Rinv, tinv, R, t] rows.
    Returns (K, 29) sums in _linearize_planar order.
    """
    if TC != 128:
        raise ValueError("fused_linearize_batch requires TC == 128")
    packed = ref_padded_k.dtype == jnp.int32
    K = ref_padded_k.shape[0]
    Hp_c, Wp_c = cur_packed.shape[1], cur_packed.shape[2]
    gR, gC = Hp_c // TR, Wp_c // TC

    # per-candidate tile schedules from the shared projection geometry
    def starts_of(prm_row):
        ui, vi, inside, vglob, uglob = _project_cur(
            cur_packed, prm_row[None], H=H, W=W, fx=fx, fy=fy, cx=cx, cy=cy,
            min_d=min_d, max_d=max_d,
        )
        return _tile_starts(
            ui, vi, inside, vglob, uglob, TR=TR, TC=TC, DV=DV, DU=DU, H=H, W=W
        )

    starts_k = jax.vmap(starts_of)(params_k).reshape(K * gR * gC, 6)

    kern = partial(
        _batch_kernel,
        TR=TR, TC=TC, DV=DV, DU=DU, H=H, W=W,
        fx=fx, fy=fy, cx=cx, cy=cy, min_d=min_d, max_d=max_d,
        nthr=nthr, dthr2=dthr2, cthr=cthr, rthr=rthr,
        max_chi2=max_chi2, robust=robust, packed=packed,
    )
    BR, BC = _dma_block_shape(TR, TC, DV, DU)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # params (K, 24) f32, starts (K*gR*gC, 6) i32
        grid=(K, gR, gC),
        in_specs=[
            pl.BlockSpec((1, C_CUR, TR, TC), lambda b, i, j, *_: (0, 0, i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # (K, C, Hpad, Wpad) HBM
        ],
        out_specs=pl.BlockSpec((1, 8, 128), lambda b, i, j, *_: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=_scratch_shapes(packed, BR, BC, TR, TC),
    )
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((K, 8, 128), jnp.float32),
        interpret=interpret,
    )(params_k, starts_k.astype(jnp.int32), cur_packed[None], ref_padded_k)
    return out[:, 0, :29]


def _batch_kernel(params_ref, start_ref, cur_ref, ref_hbm, out_ref,
                  blkbuf, acc_ref, sems, **kw):
    """Batched twin of `_kernel`: program ids (b, i, j); candidate b's params
    row, tile-schedule rows, reference plane and output row are selected by
    b, everything else is byte-identical to the per-pair kernel."""
    b = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)
    gR = pl.num_programs(1)
    gC = pl.num_programs(2)
    tiles_per_b = gR * gC
    n_tiles = pl.num_programs(0) * tiles_per_b
    t = (b * gR + i) * gC + j

    def blk_dma(tile, slot):
        bb = tile // tiles_per_b
        vs = pl.multiple_of(start_ref[tile, 0], 8)
        us = pl.multiple_of(start_ref[tile, 1], 128)
        BR, BC = _dma_block_shape(kw["TR"], kw["TC"], kw["DV"], kw["DU"])
        return pltpu.make_async_copy(
            ref_hbm.at[bb, :, pl.ds(vs, BR), pl.ds(us, BC)],
            blkbuf.at[slot],
            sems.at[slot],
        )

    @pl.when(t == 0)
    def _():
        blk_dma(0, 0).start()

    @pl.when(t + 1 < n_tiles)
    def _():
        blk_dma(t + 1, (t + 1) % 2).start()

    _kernel_body(
        params_ref, start_ref, cur_ref, out_ref, blkbuf, acc_ref, sems,
        prm_row=b, t=t, i=i, j=j, first=(t - b * tiles_per_b) == 0,
        wait=blk_dma(t, t % 2).wait, **kw,
    )


def fused_band_coverage(cur_packed, params, *, H, W, TR=16, TC=128, DV=4,
                        DU=6, fx, fy, cx, cy, min_d, max_d):
    """Fraction of projectable current pixels whose correspondence target
    falls INSIDE the banded per-tile window — the fused kernel's blind-spot
    diagnostic. Pure XLA prologue math (the same formulas `_tile_starts`
    uses); pixels outside the band lose their correspondence silently, so a
    low value tells the caller to fall back to association="gather"."""
    ui, vi, inside, vglob, uglob = _project_cur(
        cur_packed, params, H=H, W=W, fx=fx, fy=fy, cx=cx, cy=cy,
        min_d=min_d, max_d=max_d,
    )
    Hp_c, Wp_c = ui.shape
    gR, gC = Hp_c // TR, Wp_c // TC
    starts = _tile_starts(
        ui, vi, inside, vglob, uglob, TR=TR, TC=TC, DV=DV, DU=DU, H=H, W=W
    ).reshape(gR, gC, 6)
    BR, BC = _dma_block_shape(TR, TC, DV, DU)
    vstart = starts[:, :, 0]
    ustart = starts[:, :, 1]
    row0 = (jnp.arange(gR, dtype=jnp.int32) * TR)[:, None]
    col0 = (jnp.arange(gC, dtype=jnp.int32) * TC)[None, :]

    def tile4(x):
        return x.reshape(gR, TR, gC, TC)

    rdv = tile4(vi + DV - vglob) - (vstart - row0)[:, None, :, None]
    rdu = tile4(ui + DU - uglob) - (ustart - col0)[:, None, :, None]
    in_band = (
        tile4(inside)
        & (rdv >= 0) & (rdv < BR - TR)
        & (rdu >= 0) & (rdu <= 2 * DU + 127)
    )
    n_inside = jnp.maximum(jnp.sum(inside), 1)
    return jnp.sum(in_band) / n_inside.astype(cur_packed.dtype)


def prepare_fused_inputs(reference, current, *, TR=16, TC=128, DV=4, DU=6,
                         packed=True):
    """Pack + pad both clouds for fused_linearize. Returns (cur_p, ref_p).

    The reference image sits at offset (DV, DU) inside a (Hpad, Wpad) canvas
    sized so every tile-aligned DMA window stays in bounds; all padding reads
    as invalid via the curv-sentinel channel. `packed=True` (default) emits
    the bf16-pair i32 planes (pack_ref2) the fast kernel path consumes."""
    cur_p = pack_cur(current)
    H, W = cur_p.shape[1], cur_p.shape[2]
    Hp, Wp = _round_up(H, TR), _round_up(W, TC)
    if (Hp, Wp) != (H, W):
        cur_p = jnp.pad(cur_p, ((0, 0), (0, Hp - H), (0, Wp - W)))
    ref_p = pack_ref(reference)
    Hpad, Wpad = _padded_ref_shape(H, W, TR, TC, DV, DU)
    ref_p = jnp.pad(
        ref_p, ((0, 0), (DV, Hpad - H - DV), (DU, Wpad - W - DU))
    )
    # padding must read as invalid: set the curv-sentinel channel outside
    # the image region to -1 (depth-0 alone would pass the curvature gates)
    rr = jnp.arange(Hpad)
    cc_ = jnp.arange(Wpad)
    border = (
        (rr[:, None] < DV) | (rr[:, None] >= DV + H)
        | (cc_[None, :] < DU) | (cc_[None, :] >= DU + W)
    )
    ref_p = ref_p.at[4].set(jnp.where(border, -1.0, ref_p[4]))
    if packed:
        ref_p = pack_ref2(ref_p)
    return cur_p, ref_p


def prepare_fused_batch(references, current, *, TR=16, TC=128, DV=4, DU=6,
                        packed=True):
    """Batched prepare: ONE shared current packing + per-candidate padded
    reference planes. `references` is a Cloud pytree with leading dim K
    (slam/pwn_matcher.stack_clouds); returns (cur_p (20, Hp, Wp),
    ref_ps (K, 3, Hpad, Wpad) i32 — or (K, 5, ...) f32 with packed=False)."""
    cur_p = pack_cur(current)
    H, W = cur_p.shape[1], cur_p.shape[2]
    Hp, Wp = _round_up(H, TR), _round_up(W, TC)
    if (Hp, Wp) != (H, W):
        cur_p = jnp.pad(cur_p, ((0, 0), (0, Hp - H), (0, Wp - W)))
    Hpad, Wpad = _padded_ref_shape(H, W, TR, TC, DV, DU)
    rr = jnp.arange(Hpad)
    cc_ = jnp.arange(Wpad)
    border = (
        (rr[:, None] < DV) | (rr[:, None] >= DV + H)
        | (cc_[None, :] < DU) | (cc_[None, :] >= DU + W)
    )

    def one(ref_cloud):
        ref_p = pack_ref(ref_cloud)
        ref_p = jnp.pad(
            ref_p, ((0, 0), (DV, Hpad - H - DV), (DU, Wpad - W - DU))
        )
        ref_p = ref_p.at[4].set(jnp.where(border, -1.0, ref_p[4]))
        return pack_ref2(ref_p) if packed else ref_p

    return cur_p, jax.vmap(one)(references)


def params_from_invT(invT):
    """invT (4,4) -> (1, 24) f32 params row [Rinv, tinv, R, t]."""
    R = invT[:3, :3]
    t = invT[:3, 3]
    Rinv = R.T
    tinv = -Rinv @ t
    return jnp.concatenate(
        [Rinv.reshape(-1), tinv, R.reshape(-1), t]
    ).astype(jnp.float32)[None]


def unpack_sums(sums):
    """(29,) sums -> (H (6,6), b (6,), chi2, inliers) as in the jnp twin."""
    def sym(v):
        return jnp.stack(
            [
                jnp.stack([v[0], v[1], v[2]]),
                jnp.stack([v[1], v[3], v[4]]),
                jnp.stack([v[2], v[4], v[5]]),
            ]
        )

    Htt, Htr, Hrr = sym(sums[0:6]), sums[6:15].reshape(3, 3), sym(sums[15:21])
    Hm = jnp.block([[Htt, Htr], [Htr.T, Hrr]])
    return Hm, sums[21:27], sums[27], sums[28].astype(jnp.int32)
