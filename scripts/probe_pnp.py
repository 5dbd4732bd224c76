"""Probe: vmapped RANSAC-PnP (with unrolled polar/eig/GN) on the backend."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")
_ = jax.devices()

import jax.numpy as jnp
import numpy as np

from svo_tpu.config import RansacParams
from svo_tpu.geometry import camera as cam_mod, se3
from svo_tpu.geometry.pnp import ransac_pnp

S, N = 8, 128
rng = np.random.default_rng(0)
camera = cam_mod.from_intrinsics(718.0, 718.0, 620.0, 188.0, 0.54)
Xw = jnp.asarray(np.stack(
    [rng.uniform(-10, 10, (S, N)), rng.uniform(-3, 3, (S, N)),
     rng.uniform(5, 40, (S, N))], -1).astype(np.float32))
uv = jnp.asarray(rng.uniform(0, 300, (S, N, 2)).astype(np.float32))
valid = jnp.ones((S, N), bool)
keys = jax.vmap(jax.random.PRNGKey)(jnp.arange(S, dtype=jnp.uint32))
T0 = jnp.tile(jnp.eye(4, dtype=jnp.float32), (S, 1, 1))

fn = jax.jit(jax.vmap(
    lambda x, u, v, k, t: ransac_pnp(camera.K, x, u, v, k, RansacParams(), T_init=t)
))
t0 = time.perf_counter()
out = jax.block_until_ready(fn(Xw, uv, valid, keys, T0))
print(f"compile+run OK (+{time.perf_counter()-t0:.1f}s)")
reps = 30
t0 = time.perf_counter()
for _ in range(reps):
    out = fn(Xw, uv, valid, keys, T0)
jax.block_until_ready(out.T_wc)
print(f"vmapped ransac_pnp x{S}: {(time.perf_counter()-t0)/reps*1e3:.3f} ms")
