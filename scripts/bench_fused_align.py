"""End-to-end align() benchmark: fused Pallas path vs gather path on TPU."""
import os, sys, time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.jax_xla_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from bench import _make_depth_pair
from g2o_frontend_tpu.pwn.aligner import AlignerConfig, align
from g2o_frontend_tpu.pwn.converter import ConverterConfig, depth_to_cloud

H, W = 480, 640
d_ref, d_cur, proj, T_gt = _make_depth_pair(H, W)
ref = depth_to_cloud(d_ref, proj, ConverterConfig())
cur = depth_to_cloud(d_cur, proj, ConverterConfig())


def chain(cfg, n):
    def body(i, T_guess):
        r = align(ref, cur, proj, initial_guess=T_guess, config=cfg)
        stats = (jnp.sum(r.omega) + r.chi2 + r.inliers
                 + r.translational_ratio + r.rotational_ratio + jnp.sum(r.mean))
        return r.T + (1e-30 * stats).astype(r.T.dtype)

    return jax.lax.fori_loop(0, n, body, jnp.eye(4, dtype=jnp.float32))


def bench(name, cfg, lo=2, hi=22):
    fn = jax.jit(partial(chain, cfg), static_argnames=("n",))
    t0 = time.time()
    np.asarray(fn(n=lo))
    print(f"{name}: compile {time.time()-t0:.1f}s")
    np.asarray(fn(n=hi))
    ds = []
    for _ in range(3):
        t0 = time.perf_counter(); np.asarray(fn(n=lo))
        t1 = time.perf_counter(); np.asarray(fn(n=hi))
        t2 = time.perf_counter()
        ds.append(((t2 - t1) - (t1 - t0)) / (hi - lo))
    dt = float(np.median(ds))
    r = align(ref, cur, proj, config=cfg)
    T_est = np.asarray(r.T)
    err = np.linalg.inv(T_gt) @ T_est
    t_err = float(np.linalg.norm(err[:3, 3]))
    print(f"{name}: {1/dt:8.1f} fps ({dt*1e3:.2f} ms/frame)  t_err={t_err:.5f} m"
          f"  inliers={int(r.inliers)} valid={bool(r.valid)}")
    return 1 / dt, t_err


fused = AlignerConfig(association="fused")
gather = AlignerConfig(association="gather")
bench("fused ", fused)
bench("gather", gather)
