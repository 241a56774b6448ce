"""Honest on-device timing over the axon tunnel.

Per-call wall timing is polluted by ~10-20 ms tunnel dispatch latency, so we
wrap the function in an on-device ``lax.fori_loop`` of N iterations and time
the whole loop with one final transfer. A data-dependence on the loop counter
is threaded into the inputs to stop XLA hoisting the body out of the loop.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np


def device_time(f, inputs, n=20, reps=3):
    """Mean seconds per call of ``f(*inputs)`` measured inside a device loop.

    ``f`` must map arrays -> pytree of arrays. The first input must be a
    float array; the counter is mixed into it (i * 0.0) to defeat hoisting.
    """
    inputs = [jax.device_put(x) for x in inputs]

    # hoist-defeating: 1e-30*carry is a true loop-carried dependence into the
    # first input (0.0*carry would constant-fold and let XLA hoist the body).
    @jax.jit
    def loop2(first, *rest):
        # consume a reduction of EVERY output leaf — consuming one element
        # lets XLA DCE the body down to a single-element computation
        def body(i, carry):
            out = f(first + (1e-30 * carry).astype(first.dtype), *rest)
            return carry + sum(
                jnp.sum(l).astype(jnp.float32) for l in jax.tree_util.tree_leaves(out)
            )

        return jax.lax.fori_loop(0, n, body, jnp.float32(0))

    # two-point in n: slope between loop sizes cancels the per-call
    # dispatch latency exactly (timing one loop gives op + dispatch/n)
    @jax.jit
    def loop_small(first, *rest):
        def body(i, carry):
            out = f(first + (1e-30 * carry).astype(first.dtype), *rest)
            return carry + sum(
                jnp.sum(l).astype(jnp.float32) for l in jax.tree_util.tree_leaves(out)
            )

        return jax.lax.fori_loop(0, max(n // 4, 1), body, jnp.float32(0))

    np.asarray(loop2(*inputs))  # compile
    np.asarray(loop_small(*inputs))
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(loop_small(*inputs))
        t1 = time.perf_counter()
        np.asarray(loop2(*inputs))
        t2 = time.perf_counter()
        best = min(best, ((t2 - t1) - (t1 - t0)) / (n - max(n // 4, 1)))
    return best
