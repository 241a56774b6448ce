"""Stage-by-stage timing of depth_to_cloud on the current default device."""
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.jax_xla_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import sys

sys.path.insert(0, "/root/repo")
from bench import _make_depth_pair  # noqa: E402

from g2o_frontend_tpu.ops.eigh3x3 import eigh3x3_planar  # noqa: E402
from g2o_frontend_tpu.ops.integral_image import (  # noqa: E402
    integral_image_planar,
    window_moments_planar,
    window_sums_quantized_planar,
)
from g2o_frontend_tpu.pwn.converter import ConverterConfig, depth_to_cloud  # noqa: E402


def timeit(f, reps=10):
    f()
    f()
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f()
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    return (time.perf_counter() - t0) / reps


def main():
    H, W = 480, 640
    d_ref, _, proj, _ = _make_depth_pair(H, W)
    cfg = ConverterConfig()
    depth = jnp.asarray(d_ref)

    print("full convert:", timeit(lambda: depth_to_cloud(depth, proj, cfg)))

    lo, hi = cfg.min_image_radius, cfg.max_image_radius
    n_lev = min(cfg.n_radius_levels, hi - lo + 1)
    levels = tuple(
        sorted({int(round(lo * (hi / lo) ** (k / max(n_lev - 1, 1)))) for k in range(n_lev)})
    )
    print("levels:", levels)

    points, valid = jax.jit(lambda d: proj.unproject(d))(depth)
    p = jnp.moveaxis(points, -1, 0)
    p = jax.device_put(jnp.asarray(p))
    valid = jax.device_put(valid)
    radii = jax.jit(
        lambda d: jnp.clip(proj.project_intervals(d, cfg.world_radius), lo, hi)
    )(depth)

    f_unproj = jax.jit(lambda d: proj.unproject(d))
    print("unproject:", timeit(lambda: f_unproj(depth)))

    f_mom = jax.jit(lambda p, v, r: window_moments_planar(p, v, r, levels=levels))
    print("window_moments:", timeit(lambda: f_mom(p, valid, radii)))

    # split moments further
    def acc_fn(p, v):
        vv = v.astype(p.dtype)
        pm = p * vv[None]
        return jnp.stack(
            [vv, pm[0], pm[1], pm[2], pm[0] * p[0], pm[0] * p[1], pm[0] * p[2],
             pm[1] * p[1], pm[1] * p[2], pm[2] * p[2]]
        )

    f_acc = jax.jit(lambda p, v: integral_image_planar(acc_fn(p, v)))
    print("acc+integral:", timeit(lambda: f_acc(p, valid)))
    I = jax.device_put(f_acc(p, valid))
    f_ws = jax.jit(lambda I, r: window_sums_quantized_planar(I, r, levels))
    print("window_sums_quantized:", timeit(lambda: f_ws(I, radii)))

    _, _, cov6 = jax.jit(lambda p, v, r: window_moments_planar(p, v, r, levels=levels))(
        p, valid, radii
    )
    cov6 = jax.device_put(cov6)
    f_eig = jax.jit(lambda c: eigh3x3_planar(c))
    print("eigh planar:", timeit(lambda: f_eig(cov6)))


if __name__ == "__main__":
    main()
