"""Find a chunk-step composition that avoids the TPU fault: vary donation,
nesting, and group unrolling."""

import os
import sys
import time
from functools import partial

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
CACHE = f"/tmp/synth_cache_49_{H}x{W}.npz"
z = np.load(CACHE)
frames = [(i, z[f"l{i}"], z[f"r{i}"]) for i in range(13)]
K = z["K"]
cfg = Config(use_orb=False, image_height=H, image_width=W)
camera = cam_mod.from_intrinsics(
    K[0, 0], K[1, 1], K[0, 2], K[1, 2], float(z["baseline"])
)

bvo = BatchedStereoVO(cfg, camera, S, chunk=12, kf_cadence=6)
l0 = np.stack([frames[0][1]] * S)
r0 = np.stack([frames[0][2]] * S)
bvo.start(l0, r0)
state0 = jax.block_until_ready(bvo.state)
print("bootstrap OK", flush=True)

u8 = lambda x: np.clip(x, 0, 255).astype(np.uint8)
lefts = jnp.asarray(np.stack([np.stack([u8(frames[t][1])] * S) for t in range(1, 13)]))
rights = jnp.asarray(np.stack([np.stack([u8(frames[t][2])] * S) for t in range(1, 13)]))


def kstep(st, l, r):
    return frontend.step_body(
        st, l.astype(jnp.float32), r.astype(jnp.float32), camera, cfg,
        kf_mode="always")


def tstep(st, l, r):
    return frontend.step_body(
        st, l.astype(jnp.float32), r.astype(jnp.float32), camera, cfg,
        kf_mode="never")


vk = jax.vmap(kstep)
vt = jax.vmap(tstep)


def check(name, fn, *a):
    t0 = time.perf_counter()
    try:
        out = jax.block_until_ready(fn(*a))
        print(f"{name}: OK (+{time.perf_counter()-t0:.1f}s)", flush=True)
        return out
    except Exception as e:  # noqa: BLE001
        print(f"{name}: FAIL {type(e).__name__}: {str(e)[:120]}", flush=True)
        return None


def copy_state(st):
    return jax.tree.map(lambda x: jnp.array(x, copy=True), st)


# A. nested scan, NO donation
def run_nested(state, ls, rs):
    l2 = ls.reshape((2, 6) + ls.shape[1:])
    r2 = rs.reshape((2, 6) + rs.shape[1:])

    def group(st, lr):
        l, r = lr
        st = vk(st, l[0], r[0])

        def body(s, xy):
            return vt(s, xy[0], xy[1]), None

        st, _ = jax.lax.scan(body, st, (l[1:], r[1:]))
        return st, None

    state, _ = jax.lax.scan(group, state, (l2, r2))
    return state


if os.environ.get("PROBE_ALL"):
    check("nested scan, no donate", jax.jit(run_nested), copy_state(state0), lefts, rights)


# B. group-unrolled: python loop over groups, inner scan only
def run_flat(state, ls, rs):
    for g in range(2):
        state = vk(state, ls[6 * g], rs[6 * g])

        def body(s, xy):
            return vt(s, xy[0], xy[1]), None

        state, _ = jax.lax.scan(
            body, state, (ls[6 * g + 1 : 6 * g + 6], rs[6 * g + 1 : 6 * g + 6])
        )
    return state


if os.environ.get("PROBE_ALL"):
    check("unrolled groups, no donate", jax.jit(run_flat), copy_state(state0), lefts, rights)

# C. unrolled groups WITH donation
check(
    "unrolled groups, donated",
    jax.jit(run_flat, donate_argnums=(0,)),
    copy_state(state0), lefts, rights,
)
