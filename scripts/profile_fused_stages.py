"""Stage breakdown of fused_linearize on TPU: prologue / block-gather / kernel."""
import os, sys, time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.jax_xla_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from g2o_frontend_tpu.ops import pallas_aligner as pa

H, W = 480, 640
TR = int(os.environ.get("TR", 16)); TC = 128
DV, DU = 4, 6
rng = np.random.default_rng(0)
cur_p = jnp.asarray(rng.normal(size=(20, H, W)), jnp.float32)
ref_p = jnp.asarray(rng.normal(size=(5, H + 2 * DV, W + 2 * DU)), jnp.float32)
params = pa.params_from_invT(jnp.eye(4, dtype=jnp.float32))
kw = dict(H=H, W=W, fx=525., fy=525., cx=319.5, cy=239.5, min_d=0.1, max_d=10.0)


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
    vs, us = pa._tile_starts(ui, vi, inside, vg, ug, TR=TR, TC=TC, DV=DV, DU=DU, H=H, W=W)
    return jnp.float32(jnp.sum(vs) + jnp.sum(us) + jnp.sum(ui))


def full(carry):
    p2 = params + carry * 1e-30
    s = pa.fused_linearize(cur_p, ref_p, p2, TR=TR, TC=TC, DV=DV, DU=DU,
        nthr=0.866, dthr2=0.25, cthr=0.02, rthr=1.3, max_chi2=9e3, **kw)
    return jnp.sum(s) * 1e-30


print("platform:", jax.devices()[0].platform)
timeit("prologue (proj+means)", prologue)
timeit("full fused_linearize", full)
