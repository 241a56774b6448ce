"""Round-2 aligner breakdown: time each stage of one outer iteration on the
real TPU (association gather, linearize reductions, 6x6 solve+chart epilogue,
statistics epilogue), plus the full align, to locate the 13.6 ms/frame.

All timings use chained fori_loops + two-point subtraction (the bench.py
pattern) because axon block_until_ready does not synchronize.
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
from g2o_frontend_tpu.pwn.aligner import (
    AlignerConfig, _correspondences_gather, _linearize_planar, align)
from g2o_frontend_tpu.pwn.converter import ConverterConfig, depth_to_cloud
from g2o_frontend_tpu.utils import lie

H, W = 480, 640
d_ref, d_cur, proj, T_gt = _make_depth_pair(H, W)
ccfg = ConverterConfig()
cfg = AlignerConfig(outer_iterations=10)
ref = depth_to_cloud(d_ref, proj, ccfg)
cur = depth_to_cloud(d_cur, proj, ccfg)


def chain(body, n):
    """Loop body(invT)->invT n times from identity; returns invT."""
    def f(i, invT):
        return body(invT)
    return jax.lax.fori_loop(0, n, f, jnp.eye(4, dtype=jnp.float32))


def timeit(name, body, lo=3, hi=43):
    fn = jax.jit(partial(chain, body), static_argnames=("n",))
    np.asarray(fn(n=lo)); np.asarray(fn(n=hi))
    ds = []
    for _ in range(3):
        t0 = time.perf_counter(); np.asarray(fn(n=lo))
        t1 = time.perf_counter(); np.asarray(fn(n=hi))
        t2 = time.perf_counter()
        ds.append(((t2 - t1) - (t1 - t0)) / (hi - lo))
    dt = float(np.median(ds))
    print(f"{name:34s} {dt*1e3:8.3f} ms/iter   ({1/dt:8.1f} it/s)")
    return dt


# stage 1: association only (consume mask+fields into the carry)
def assoc_body(invT):
    mask, rp, rn = _correspondences_gather(ref, cur, invT, proj, cfg)
    s = jnp.sum(mask) + jnp.sum(rp) + jnp.sum(rn)
    return invT + (1e-30 * s).astype(invT.dtype)


# stage 2: linearize only (association fixed at identity, hoisted out? no —
# depends on invT via remap inside linearize; mask/rp/rn precomputed once)
mask0, rp0, rn0 = jax.jit(
    lambda t: _correspondences_gather(ref, cur, t, proj, cfg))(jnp.eye(4))
np.asarray(mask0)


def lin_body(invT):
    Hm, b, chi2, inl = _linearize_planar(mask0, rp0, rn0, cur, invT, cfg)
    dx = jnp.linalg.solve(Hm + cfg.damping * jnp.eye(6), -b)
    return lie.se3_v2t(dx) @ invT


# stage 3: solve + chart epilogue only
Hm0, b0, _, _ = jax.jit(
    lambda t: _linearize_planar(mask0, rp0, rn0, cur, t, cfg))(jnp.eye(4))
np.asarray(Hm0)


def solve_body(invT):
    dx = jnp.linalg.solve(Hm0 + cfg.damping * jnp.eye(6) + invT[0, 0] * 1e-30, -b0)
    invT = lie.se3_v2t(dx) @ invT
    return lie.se3_v2t(lie.se3_t2v(invT))


# full outer iteration
def outer_body(invT):
    mask, rp, rn = _correspondences_gather(ref, cur, invT, proj, cfg)
    Hm, b, chi2, inl = _linearize_planar(mask, rp, rn, cur, invT, cfg)
    dx = jnp.linalg.solve(Hm + cfg.damping * jnp.eye(6), -b)
    invT = lie.se3_v2t(dx) @ invT
    return lie.se3_v2t(lie.se3_t2v(invT))


# statistics epilogue (once per align; time it as a chained body)
def stats_body(invT):
    r = align(ref, cur, proj, initial_guess=invT,
              config=AlignerConfig(outer_iterations=1))
    s = jnp.sum(r.omega) + r.chi2 + r.inliers
    return r.T + (1e-30 * s).astype(r.T.dtype)


print(f"platform: {jax.devices()[0].platform}")
t_assoc = timeit("assoc gather only", assoc_body)
t_lin = timeit("linearize+solve (fixed assoc)", lin_body)
t_solve = timeit("6x6 solve+chart only", solve_body)
t_outer = timeit("full outer iter (assoc+lin+solve)", outer_body)
t_align1 = timeit("align 1-outer (incl stats epilogue)", stats_body, lo=2, hi=22)
print(f"\nfull-frame estimate: 10*outer = {10*t_outer*1e3:.2f} ms; "
      f"stats epilogue ~= {(t_align1 - t_outer)*1e3:.2f} ms")
