"""Bisect the Pallas-in-chunk fault with the REAL frontend step body."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
_ = jax.devices()

import jax.numpy as jnp
import numpy as np

from svo_tpu.config import Config
from svo_tpu.geometry import camera as cam_mod
from svo_tpu.parallel.batched import BatchedStereoVO
from svo_tpu.pipeline import frontend

S = 8
H, W = 376, 1241
N_F = 13
CACHE = f"/tmp/synth_cache_49_{H}x{W}.npz"
z = np.load(CACHE)
frames = [(i, z[f"l{i}"], z[f"r{i}"]) for i in range(N_F)]
K = z["K"]
cfg = Config(use_orb=False, image_height=H, image_width=W)
camera = cam_mod.from_intrinsics(
    K[0, 0], K[1, 1], K[0, 2], K[1, 2], float(z["baseline"])
)

bvo = BatchedStereoVO(cfg, camera, S, chunk=12, kf_cadence=6)
l0 = np.stack([frames[0][1]] * S)
r0 = np.stack([frames[0][2]] * S)
bvo.start(l0, r0)
jax.block_until_ready(bvo.state.pose)
print("bootstrap OK", flush=True)


def check(name, fn, *a):
    t0 = time.perf_counter()
    try:
        out = jax.block_until_ready(fn(*a))
        print(f"{name}: OK (+{time.perf_counter()-t0:.1f}s)", flush=True)
        return out
    except Exception as e:  # noqa: BLE001
        print(f"{name}: FAIL {type(e).__name__}: {str(e)[:160]}", flush=True)
        return None


def tstep(st, l, r):
    return frontend.step_body(
        st, l.astype(jnp.float32), r.astype(jnp.float32), camera, cfg,
        kf_mode="never",
    )


def kstep(st, l, r):
    return frontend.step_body(
        st, l.astype(jnp.float32), r.astype(jnp.float32), camera, cfg,
        kf_mode="always",
    )


l1 = jnp.asarray(np.stack([frames[1][1]] * S), jnp.float32)
r1 = jnp.asarray(np.stack([frames[1][2]] * S), jnp.float32)

# 1. single vmapped track-only step
st = check("vmap track step", jax.jit(jax.vmap(tstep)), bvo.state, l1, r1)

# 2. single vmapped KF step
if st is not None:
    st2 = check("vmap KF step", jax.jit(jax.vmap(kstep)), st, l1, r1)

# 3. scan of 5 track-only steps
u8 = lambda x: np.clip(x, 0, 255).astype(np.uint8)
ls = jnp.asarray(np.stack(
    [np.stack([u8(frames[t][1])] * S) for t in range(2, 7)]))
rs = jnp.asarray(np.stack(
    [np.stack([u8(frames[t][2])] * S) for t in range(2, 7)]))

@jax.jit
def scan5(st, ls, rs):
    def body(s, lr):
        return jax.vmap(tstep)(s, lr[0], lr[1]), None
    s, _ = jax.lax.scan(body, st, (ls, rs))
    return s

if st is not None:
    st3 = check("scan5 track steps", scan5, st, ls, rs)

# 4. the full cadenced chunk (known bad?)
lefts = jnp.asarray(np.stack(
    [np.stack([u8(frames[t][1])] * S) for t in range(1, 13)]))
rights = jnp.asarray(np.stack(
    [np.stack([u8(frames[t][2])] * S) for t in range(1, 13)]))
check("full cadenced chunk", bvo._chunk_step, bvo.state, lefts, rights)
