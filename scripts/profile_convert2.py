"""Converter stage timing with on-device loops (honest, tunnel-proof)."""
import sys
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")
import jax
jax.config.update("jax_compilation_cache_dir", "/root/.jax_xla_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np
from devtime import device_time
from bench import _make_depth_pair
from g2o_frontend_tpu.ops.eigh3x3 import eigh3x3_planar
from g2o_frontend_tpu.ops.integral_image import (
    integral_image_planar, window_moments_planar, window_sums_quantized_planar)
from g2o_frontend_tpu.pwn.converter import ConverterConfig, depth_to_cloud
from g2o_frontend_tpu.pwn.aligner import align, AlignerConfig

H, W = 480, 640
d_ref, d_cur, proj, T_gt = _make_depth_pair(H, W)
cfg = ConverterConfig()
depth = jnp.asarray(d_ref)

print("full convert:", device_time(lambda d: depth_to_cloud(d, proj, cfg), [depth]))

lo, hi = cfg.min_image_radius, cfg.max_image_radius
n_lev = min(cfg.n_radius_levels, hi - lo + 1)
levels = tuple(sorted({int(round(lo * (hi / lo) ** (k / max(n_lev - 1, 1)))) for k in range(n_lev)}))

points, valid = jax.jit(lambda d: proj.unproject(d))(depth)
p = jnp.moveaxis(points, -1, 0)
radii = jax.jit(lambda d: jnp.clip(proj.project_intervals(d, cfg.world_radius), lo, hi))(depth)

print("unproject:", device_time(lambda d: proj.unproject(d), [depth]))
print("window_moments:", device_time(
    lambda p, v, r: window_moments_planar(p, v.astype(bool), r, levels=levels),
    [p, valid.astype(jnp.float32), radii]))

def acc_fn(p, v):
    vv = v
    pm = p * vv[None]
    return jnp.stack([vv, pm[0], pm[1], pm[2], pm[0]*p[0], pm[0]*p[1], pm[0]*p[2],
                      pm[1]*p[1], pm[1]*p[2], pm[2]*p[2]])

print("acc+integral:", device_time(
    lambda p, v: integral_image_planar(acc_fn(p, v)), [p, valid.astype(jnp.float32)]))
I = jax.jit(lambda p, v: integral_image_planar(acc_fn(p, v)))(p, valid.astype(jnp.float32))
print("window_sums_quantized:", device_time(
    lambda I, r: window_sums_quantized_planar(I, r, levels), [I, radii]))
_, _, cov6 = jax.jit(lambda p, v, r: window_moments_planar(p, v, r, levels=levels))(p, valid.astype(bool), radii)
print("eigh planar:", device_time(lambda c: eigh3x3_planar(c), [cov6]))

# aligner per-frame for comparison
ref_c = depth_to_cloud(jnp.asarray(d_ref), proj, cfg)
cur_c = depth_to_cloud(jnp.asarray(d_cur), proj, cfg)
acfg = AlignerConfig()
print("align (10 outer):", device_time(
    lambda dp, dc: align(ref_c._replace(p=ref_c.p + 0.0*dp[None,:1,:1]), cur_c, proj, config=acfg).T,
    [jnp.zeros((1,1), jnp.float32), jnp.zeros((1,1), jnp.float32)], n=10))
