"""Can Mosaic lower dynamic gathers inside a Pallas TPU kernel?

Tests: (a) take_along_axis along lanes within one (8,128) tile,
(b) along a 1024-long lane dim, (c) arbitrary 2D gather from a (R, 128)
VMEM block via flat indices, (d) one-hot matmul gather on the MXU.
"""
import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.jax_xla_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

rng = np.random.default_rng(0)


def try_kernel(name, fn, *args):
    try:
        out = jax.jit(fn)(*args)
        np.asarray(out)
        print(f"{name:44s} OK  out={np.asarray(out).ravel()[:4]}")
        return True
    except Exception as e:
        msg = str(e).split("\n")[0][:120]
        print(f"{name:44s} FAIL {type(e).__name__}: {msg}")
        return False


# (a) take_along_axis along lanes in one tile
def k_a(x_ref, i_ref, o_ref):
    o_ref[...] = jnp.take_along_axis(x_ref[...], i_ref[...], axis=1)


x = jnp.asarray(rng.normal(size=(8, 128)), jnp.float32)
i = jnp.asarray(rng.integers(0, 128, (8, 128)), jnp.int32)
try_kernel(
    "take_along_axis lanes (8,128)",
    lambda x, i: pl.pallas_call(
        k_a,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x, i),
    x, i,
)

# (b) along 1024-long lane dim
x2 = jnp.asarray(rng.normal(size=(8, 1024)), jnp.float32)
i2 = jnp.asarray(rng.integers(0, 1024, (8, 1024)), jnp.int32)
try_kernel(
    "take_along_axis lanes (8,1024)",
    lambda x, i: pl.pallas_call(
        k_a,
        out_shape=jax.ShapeDtypeStruct((8, 1024), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x, i),
    x2, i2,
)


# (b2) gather along sublanes: take_along_axis axis=0 of (1024, 128)
def k_b2(x_ref, i_ref, o_ref):
    o_ref[...] = jnp.take_along_axis(x_ref[...], i_ref[...], axis=0)


x3 = jnp.asarray(rng.normal(size=(1024, 128)), jnp.float32)
i3 = jnp.asarray(rng.integers(0, 1024, (8, 128)), jnp.int32)
try_kernel(
    "take_along_axis sublanes (1024,128)->(8,128)",
    lambda x, i: pl.pallas_call(
        k_b2,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x, i),
    x3, i3,
)


# (c) arbitrary flat gather from (64*128,) via jnp.take reshaped (8, N/8)?
def k_c(x_ref, i_ref, o_ref):
    flat = x_ref[...].reshape(1, -1)  # (1, 8192)
    idx = i_ref[...]
    o_ref[...] = jnp.take_along_axis(
        jnp.broadcast_to(flat, (8, flat.shape[1])), idx, axis=1
    )[:, :128]


xc = jnp.asarray(rng.normal(size=(64, 128)), jnp.float32)
ic = jnp.asarray(rng.integers(0, 8192, (8, 8192)), jnp.int32)
try_kernel(
    "flat gather (8192,) via broadcast+taa",
    lambda x, i: pl.pallas_call(
        k_c,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x, i),
    xc, ic,
)

print("done")
