"""Isolate the chunk-step TPU fault: vmapped temporal KLT alone, then under
a donated lax.scan, then with the fb-check pattern."""

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

import dataclasses
import jax.numpy as jnp
import numpy as np

from svo_tpu.config import Config
from svo_tpu.ops.klt import KltTracker

S, N = 8, 128
H, W = 376, 1241
cfg = Config(use_orb=False, image_height=H, image_width=W)
rng = np.random.default_rng(0)
imgs0 = jnp.asarray(rng.uniform(0, 255, (S, H, W)).astype(np.float32))
imgs1 = jnp.asarray(rng.uniform(0, 255, (S, H, W)).astype(np.float32))
pos = jnp.asarray(
    np.stack([rng.uniform(30, W - 30, (S, N)), rng.uniform(30, H - 30, (S, N))],
             -1).astype(np.float32)
)
valid = jnp.ones((S, N), bool)

def step(l, r, p, v):
    pyr0 = KltTracker.build_pyramid(l, cfg.temporal_klt.max_level)
    pyr1 = KltTracker.build_pyramid(r, cfg.temporal_klt.max_level)
    res = KltTracker.track(pyr0, pyr1, p, v, cfg.temporal_klt)
    return res.pos, res.status

def check(name, fn, *a, **kw):
    t0 = time.perf_counter()
    try:
        out = jax.block_until_ready(fn(*a, **kw))
        print(f"{name}: OK (+{time.perf_counter()-t0:.1f}s)", flush=True)
        return out
    except Exception as e:  # noqa: BLE001
        print(f"{name}: FAIL {type(e).__name__}: {str(e)[:200]}", flush=True)
        return None

# 1. vmapped temporal track
check("vmap temporal", jax.jit(jax.vmap(step)), imgs0, imgs1, pos, valid)

# 2. fb pattern: level-0-only params
fbp = dataclasses.replace(cfg.temporal_klt, max_level=0, max_iters=8)

def fb_step(l, r, p, v):
    pyr0 = KltTracker.build_pyramid(l, cfg.temporal_klt.max_level)
    pyr1 = KltTracker.build_pyramid(r, cfg.temporal_klt.max_level)
    res = KltTracker.track(pyr0, pyr1, p, v, fbp, init_flow=p * 0 + 1.0)
    return res.pos, res.status

check("vmap fb(level0)", jax.jit(jax.vmap(fb_step)), imgs0, imgs1, pos, valid)

# 3. donated scan of vmapped track
@jax.jit
def scan_track(p, ls, rs):
    def body(carry, lr):
        pp = carry
        l, r = lr
        np_, st = jax.vmap(step)(l, r, pp, valid)
        return np_, None
    out, _ = jax.lax.scan(body, p, (ls, rs))
    return out

ls = jnp.stack([imgs0, imgs1])
rs = jnp.stack([imgs1, imgs0])
check("scan of vmap track", scan_track, pos, ls, rs)

# 4. donated version
scan_don = jax.jit(scan_track.__wrapped__, donate_argnums=(0,))
check("donated scan of vmap track", scan_don, pos, ls, rs)
