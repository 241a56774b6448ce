"""Cost of the align statistics epilogue (svd/pinv/cholesky on 6x6)."""
import sys
sys.path.insert(0, "/root/repo"); sys.path.insert(0, "/root/repo/scripts")
import jax
jax.config.update("jax_compilation_cache_dir", "/root/.jax_xla_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np
from devtime import device_time
from bench import _make_depth_pair
from g2o_frontend_tpu.pwn.converter import ConverterConfig, depth_to_cloud
from g2o_frontend_tpu.pwn import aligner as A

H, W = 120, 160
d_ref, d_cur, proj0, _ = _make_depth_pair(480, 640)
proj = proj0.scaled(4)
ccfg = ConverterConfig(min_image_radius=3, max_image_radius=8, min_points=12)
ref = depth_to_cloud(jnp.asarray(d_ref)[::4, ::4], proj, ccfg)
cur = depth_to_cloud(jnp.asarray(d_cur)[::4, ::4], proj, ccfg)

cfg0 = A.AlignerConfig(outer_iterations=0)
cfg10 = A.AlignerConfig(outer_iterations=10)

def mk(cfg):
    def f(dummy):
        r = A.align(ref._replace(p=ref.p + dummy[0, 0] * 1e-30), cur, proj, config=cfg)
        return (r.T.sum() + r.omega.sum() + r.chi2 + r.inliers
                + r.translational_ratio + r.rotational_ratio + r.mean.sum())
    return f

z = jnp.zeros((1, 1), jnp.float32)
t0 = device_time(mk(cfg0), [z], n=30)
t10 = device_time(mk(cfg10), [z], n=30)
print("align outer=0 (stats only + 1 assoc/lin):", t0)
print("align outer=10:", t10)
print("per-iter:", (t10 - t0) / 10)

# raw small linalg costs
M = jnp.asarray(np.random.default_rng(0).normal(size=(6, 6)).astype(np.float32))
M = M @ M.T + jnp.eye(6)
print("svd3x3 pair + pinv6 + chol6 + eye... individually:")
print("  svd(3x3):", device_time(lambda x: jnp.linalg.svd(x[:3, :3] + jnp.eye(3), compute_uv=False), [M], n=50))
print("  svd(6x6):", device_time(lambda x: jnp.linalg.svd(x, compute_uv=False), [M], n=50))
print("  pinv(6x6):", device_time(lambda x: jnp.linalg.pinv(x), [M], n=50))
print("  cholesky(6x6):", device_time(lambda x: jnp.linalg.cholesky(x), [M], n=50))
print("  solve(6x6):", device_time(lambda x: jnp.linalg.solve(x, x[:, 0]), [M], n=50))
