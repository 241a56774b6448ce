"""Stage breakdown of fused_linearize on TPU: prologue vs full kernel.

Uses the bench scene (room corner + known motion) so the per-tile row/chunk
bounds behave as in the benchmark — random inputs would defeat the bounds
and overstate the kernel cost. Also reports the mean active rows/chunks per
tile (the work the bounds actually admit).
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

from bench import _make_depth_pair
from g2o_frontend_tpu.ops import pallas_aligner as pa
from g2o_frontend_tpu.pwn.aligner import AlignerConfig
from g2o_frontend_tpu.pwn.converter import ConverterConfig, depth_to_cloud

H, W = 480, 640
TR = int(os.environ.get("TR", 16))
TC = 128
DV, DU = 4, 6

d_ref, d_cur, proj, T_gt = _make_depth_pair(H, W)
ccfg = ConverterConfig()
ref = depth_to_cloud(d_ref, proj, ccfg)
cur = depth_to_cloud(d_cur, proj, ccfg)
cur_p, ref_p = pa.prepare_fused_inputs(ref, cur, TR=TR, TC=TC, DV=DV, DU=DU)
params = pa.params_from_invT(jnp.eye(4, dtype=jnp.float32))
acfg = AlignerConfig()
kw = dict(H=H, W=W, fx=proj.fx, fy=proj.fy, cx=proj.cx, cy=proj.cy,
          min_d=proj.min_distance, max_d=proj.max_distance)
gates = dict(nthr=acfg.inlier_normal_angular_threshold,
             dthr2=acfg.inlier_distance_threshold**2,
             cthr=acfg.flat_curvature_threshold,
             rthr=acfg.inlier_curvature_ratio_threshold,
             max_chi2=acfg.inlier_max_chi2)


def chain(body, n):
    def f(i, carry):
        return body(carry)
    return jax.lax.fori_loop(0, n, f, jnp.float32(0))


def timeit(name, body, lo=3, hi=83):
    fn = jax.jit(partial(chain, body), static_argnames=("n",))
    np.asarray(fn(n=lo)); np.asarray(fn(n=hi))
    ds = []
    for _ in range(3):
        t0 = time.perf_counter(); np.asarray(fn(n=lo))
        t1 = time.perf_counter(); np.asarray(fn(n=hi))
        t2 = time.perf_counter()
        ds.append(((t2 - t1) - (t1 - t0)) / (hi - lo))
    dt = float(np.median(ds))
    print(f"{name:28s} {dt*1e3:8.3f} ms/iter")
    return dt


def prologue(carry):
    p2 = params + carry * 1e-30
    ui, vi, inside, vg, ug = pa._project_cur(cur_p, p2, **kw)
    starts = pa._tile_starts(ui, vi, inside, vg, ug, TR=TR, TC=TC,
                             DV=DV, DU=DU, H=H, W=W)
    return jnp.float32(jnp.sum(starts) + jnp.sum(ui))


def full(carry):
    p2 = params + carry * 1e-30
    s = pa.fused_linearize(cur_p, ref_p, p2, TR=TR, TC=TC, DV=DV, DU=DU,
                           **kw, **gates)
    return jnp.sum(s) * 1e-30


print("platform:", jax.devices()[0].platform)
ui, vi, inside, vg, ug = pa._project_cur(cur_p, params, **kw)
st = np.asarray(pa._tile_starts(ui, vi, inside, vg, ug, TR=TR, TC=TC,
                                DV=DV, DU=DU, H=H, W=W))
rows = st[:, 3] - st[:, 2] + 1
chunks = st[:, 5] - st[:, 4] + 1
occ = rows > 0
BR, BC = pa._dma_block_shape(TR, TC, DV, DU)
print(f"tiles: {len(st)} active: {occ.sum()}  "
      f"mean rows: {rows[occ].mean():.2f}/{BR - TR}  "
      f"mean chunks: {chunks[occ].mean():.2f}/{BC // TC}")
timeit("prologue (proj+bounds)", prologue)
timeit("full fused_linearize", full)
