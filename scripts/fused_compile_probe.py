import os, sys, time
sys.path.insert(0, '/root/repo')
import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.jax_xla_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from g2o_frontend_tpu.ops.pallas_aligner import fused_linearize, params_from_invT
H, W = 480, 640
DV = int(os.environ.get("DV", 1)); DU = int(os.environ.get("DU", 1))
TR = int(os.environ.get("TR", 16)); TC = int(os.environ.get("TC", 128))
rng = np.random.default_rng(0)
cur_p = jnp.asarray(rng.normal(size=(20, H, W)), jnp.float32)
ref_p = jnp.asarray(rng.normal(size=(5, H+2*DV, W+2*DU)), jnp.float32)
params = params_from_invT(jnp.eye(4, dtype=jnp.float32))
t0 = time.time()
s = fused_linearize(cur_p, ref_p, params, H=H, W=W, TR=TR, TC=TC, DV=DV, DU=DU,
    fx=525., fy=525., cx=319.5, cy=239.5, min_d=0.1, max_d=10.0,
    nthr=0.866, dthr2=0.25, cthr=0.02, rthr=1.3, max_chi2=9e3)
np.asarray(s)
print(f"DV={DV} DU={DU} TR={TR} TC={TC}: compile+run {time.time()-t0:.1f}s")
