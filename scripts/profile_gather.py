"""Microbenchmark: TPU gather strategies for the projective association.

The association needs out[c, i] = table[c, idx[i]] for c in 0..7,
i in 0..N-1 (N = 307200), where idx is a near-identity permutation-ish map
(projective warp with small motion: |idx[i] - i| is typically < ~30*W but
locally smooth).
"""
import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.jax_xla_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

H, W = 480, 640
N = H * W
C = 8
rng = np.random.default_rng(0)

# realistic warp indices: smooth displacement field, few-pixel local delta
vs, us = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
du = (6.0 * np.sin(vs / 37.0) + 10.0 * (us - W / 2) / W).astype(np.int32)
dv = (4.0 * np.cos(us / 53.0) + 8.0 * (vs - H / 2) / H).astype(np.int32)
ui = np.clip(us + du, 0, W - 1)
vi = np.clip(vs + dv, 0, H - 1)
idx = (vi * W + ui).reshape(-1).astype(np.int32)

table_cn = jnp.asarray(rng.normal(size=(C, N)), jnp.float32)
table_nc = jnp.asarray(np.asarray(table_cn).T.copy(), jnp.float32)
idx_j = jnp.asarray(idx)
vi_j = jnp.asarray(vi)
ui_j = jnp.asarray(ui)


def chain(body, x, n):
    def f(i, carry):
        out = body(x, carry)
        return out

    return jax.lax.fori_loop(0, n, f, jnp.float32(0))


def timeit(name, body, x, lo=3, hi=53):
    fn = jax.jit(partial(chain, body), static_argnames=("n",))
    np.asarray(fn(x, n=lo)); np.asarray(fn(x, n=hi))
    ds = []
    for _ in range(3):
        t0 = time.perf_counter(); np.asarray(fn(x, n=lo))
        t1 = time.perf_counter(); np.asarray(fn(x, n=hi))
        t2 = time.perf_counter()
        ds.append(((t2 - t1) - (t1 - t0)) / (hi - lo))
    dt = float(np.median(ds))
    gb = C * N * 4 * 2 / 1e9
    print(f"{name:38s} {dt*1e3:8.3f} ms   ({gb/dt:7.1f} GB/s eff)")
    return dt


# 1. current: take along lanes of (C, N)
def g_lane(x, carry):
    i2 = idx_j + (carry * 1e-30).astype(jnp.int32)
    out = jnp.take(x, i2, axis=1)
    return jnp.sum(out)


# 2. take rows of (N, C)
def g_row(x, carry):
    i2 = idx_j + (carry * 1e-30).astype(jnp.int32)
    out = jnp.take(x, i2, axis=0)
    return jnp.sum(out)


# 3. row gather of 2D image per channel: vi/ui double gather
#    (take rows of (H, W) then take along lanes) - per channel
def g_2d(x, carry):
    v2 = vi_j + (carry * 1e-30).astype(jnp.int32)
    img = x.reshape(C, H, W)
    rows = jnp.take(img, v2.reshape(-1), axis=1)  # (C, N, W) -- too big!
    return jnp.sum(rows[:, 0, 0])


# 4. vmap'd dynamic_slice row gather: for each output row, slice the input
#    row vi varies per pixel... skip.

# 5. one_hot matmul in W-blocks: out[v,u] = sum_w onehot[u,w]*refrow[v',w]
#    needs row gather first; skip for now.

# 6. reshaped row-gather: treat as (N//B, B*C) blocks? indices not aligned.

# 7. sort-based gather
def g_sort(x, carry):
    i2 = idx_j + (carry * 1e-30).astype(jnp.int32)
    order = jnp.argsort(i2)
    sidx = i2[order]
    svals = jnp.take(x, sidx, axis=1)
    out = jnp.zeros_like(svals).at[:, order].set(svals)
    return jnp.sum(out)


# 8. row-then-lane two-stage: gather whole rows (N distinct row picks is
#    N*W traffic = too big). Instead: per OUTPUT ROW block assume source rows
#    within +-DV band: build from shifts.
DV, DU = 12, 16


def g_shift(x, carry):
    img = x.reshape(C, H, W)
    du_f = (du + (carry * 1e-30)).astype(jnp.float32)
    dv_f = jnp.asarray(dv, jnp.float32)
    acc = jnp.zeros((C, H, W), jnp.float32)
    for dy in range(-DV, DV + 1, 4):
        for dx in range(-DU, DU + 1, 4):
            hit = (jnp.abs(dv_f - dy) < 2) & (jnp.abs(du_f - dx) < 2)
            shifted = jnp.roll(img, (-dy, -dx), axis=(1, 2))
            acc = acc + jnp.where(hit, shifted, 0.0)
    return jnp.sum(acc)


print(f"platform: {jax.devices()[0].platform}; N={N}, C={C}")
timeit("take axis=1 of (C,N) [current]", g_lane, table_cn)
timeit("take axis=0 of (N,C)", g_row, table_nc)
timeit("sort-based gather", g_sort, table_cn, lo=2, hi=12)
timeit("banded shift sum (coarse 4px grid)", g_shift, table_cn)
