"""Honest split of the aligner iteration: association vs linearize."""
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
from g2o_frontend_tpu.pwn.converter import ConverterConfig, depth_to_cloud
from g2o_frontend_tpu.pwn import aligner as A

H, W = 480, 640
d_ref, d_cur, proj, T_gt = _make_depth_pair(H, W)
ccfg = ConverterConfig()
ref = depth_to_cloud(jnp.asarray(d_ref), proj, ccfg)
cur = depth_to_cloud(jnp.asarray(d_cur), proj, ccfg)
cfg = A.AlignerConfig()
I4 = jnp.eye(4, dtype=jnp.float32)

def assoc(dummy):
    invT = I4 + dummy[0, 0] * 0
    m, rp, rn = A._correspondences_gather(ref, cur, invT, proj, cfg)
    return m.sum(), rp.sum(), rn.sum()

def assoc_and_lin(dummy):
    invT = I4 + dummy[0, 0] * 0
    m, rp, rn = A._correspondences_gather(ref, cur, invT, proj, cfg)
    return A._linearize_planar(m, rp, rn, cur, invT, cfg)

m0, rp0, rn0 = A._correspondences_gather(ref, cur, I4, proj, cfg)
def lin_only(dummy):
    invT = I4 + dummy[0, 0] * 0
    return A._linearize_planar(m0, rp0 + dummy[:1, :1], rn0, cur, invT, cfg)

z = jnp.zeros((1, 1), jnp.float32)
print("assoc only:      ", device_time(assoc, [z], n=30))
print("assoc+linearize: ", device_time(assoc_and_lin, [z], n=30))
print("linearize only:  ", device_time(lin_only, [z], n=30))

# batched closer workload: vmap align over K pairs at scale 4
from functools import partial
K = 16
proj4 = proj.scaled(4)
ccfg4 = ConverterConfig(min_image_radius=3, max_image_radius=8, min_points=12)
r4 = depth_to_cloud(jnp.asarray(d_ref)[::4, ::4], proj4, ccfg4)
c4 = depth_to_cloud(jnp.asarray(d_cur)[::4, ::4], proj4, ccfg4)
refs = jax.tree_util.tree_map(lambda x: jnp.stack([x] * K), r4)
curs = jax.tree_util.tree_map(lambda x: jnp.stack([x] * K), c4)

def batt(dummy):
    rr = jax.tree_util.tree_map(lambda x: x, refs)
    rr = rr._replace(p=rr.p + dummy[0, 0] * 0)
    res = jax.vmap(lambda a, b: A.align(a, b, proj4, config=cfg))(rr, curs)
    return res.T.sum() + res.omega.sum() + res.chi2.sum()

print("vmap align K=16 scale4:", device_time(batt, [z], n=10), "(per shot)")
