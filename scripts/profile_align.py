"""Microbenchmark of the PWN align stages on the current default device.

Times, at the reference envelope (640x480), 10x loops of: association only,
linearization only (fixed correspondences), stats epilogue, and the full
align — to locate the bottleneck before optimizing.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.jax_xla_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import sys

sys.path.insert(0, "/root/repo")
from bench import _make_depth_pair  # noqa: E402

from g2o_frontend_tpu.pwn import aligner as A  # noqa: E402
from g2o_frontend_tpu.pwn.converter import ConverterConfig, depth_to_cloud  # noqa: E402


def timeit(f, reps=5):
    f()  # compile
    f()
    t0 = time.perf_counter()
    outs = [f() for _ in range(reps)]
    np.asarray(jax.tree_util.tree_leaves(outs[-1])[0])
    return (time.perf_counter() - t0) / reps


def main():
    H, W = 480, 640
    d_ref, d_cur, proj, T_gt = _make_depth_pair(H, W)
    cfg = A.AlignerConfig(outer_iterations=10)
    ref = depth_to_cloud(d_ref, proj, ConverterConfig())
    cur = depth_to_cloud(d_cur, proj, ConverterConfig())

    @jax.jit
    def assoc10(invT):
        def body(i, carry):
            m, rp, rn = A._correspondences_gather(ref, cur, invT, proj, cfg)
            return (carry[0] + m.sum(), rp, rn)

        z = jnp.zeros((), jnp.int32)
        return jax.lax.fori_loop(
            0, 10, body,
            (z, jnp.zeros_like(ref.points), jnp.zeros_like(ref.normals)),
        )

    invT = jnp.eye(4)
    mask, rp, rn = A._correspondences_gather(ref, cur, invT, proj, cfg)
    mask, rp, rn = jax.tree.map(jnp.asarray, (mask, rp, rn))

    @jax.jit
    def lin10(invT):
        def body(i, invT):
            Hm, b, _, _ = A._linearize(mask, rp, rn, cur, invT, cfg)
            Hm = Hm + cfg.damping * jnp.eye(6, dtype=invT.dtype)
            dx = jnp.linalg.solve(Hm, -b)
            return A.lie.se3_v2t(dx) @ invT

        return jax.lax.fori_loop(0, 10, body, invT)

    @jax.jit
    def full(invT):
        return A.align(ref, cur, proj, config=cfg).T

    print("assoc x10 :", timeit(lambda: assoc10(invT)))
    print("linear x10:", timeit(lambda: lin10(invT)))
    print("full align:", timeit(lambda: full(invT)))


if __name__ == "__main__":
    main()
