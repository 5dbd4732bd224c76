"""Probe 2: aligned VMEM loads + dynamic roll for per-feature patch extraction.

y start: rounded down to a multiple of 8 (pl.multiple_of hint), patch grown
by 8 rows to cover the shift. x start: rounded down to a multiple of 128,
(PY, 256) two-tile load, pltpu.roll by the remainder, crop to PX lanes.
"""

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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

S, N, H, W = 8, 256, 376, 1241
BF = 32
PY, PX = 48, 64          # output patch (rows incl. +8 alignment slack, cols)
WPAD = ((W + 255) // 256) * 256  # image padded so x0a + 256 always fits

rng = np.random.default_rng(0)
imgs_np = rng.uniform(0, 255, (4, S, H, W)).astype(np.float32)
imgs_pad = np.zeros((4, S, H, WPAD), np.float32)
imgs_pad[..., :W] = imgs_np
imgs = [jnp.asarray(imgs_pad[i]) for i in range(4)]

# raw desired top-left corners (pre-alignment), in valid range
ys = rng.integers(0, H - 41, (S, N)).astype(np.int32)   # desired y0 (40 rows)
xs = rng.integers(0, W - 41, (S, N)).astype(np.int32)   # desired x0 (40 cols)
corners = jnp.asarray(np.stack([ys, xs], -1).reshape(-1))


def kernel(corner_ref, a_ref, b_ref, c_ref, d_ref, ao, bo, co, do):
    s = pl.program_id(0)
    blk = pl.program_id(1)

    def body(k, _):
        f = (s * N + blk * BF + k) * 2
        y0 = corner_ref[f]
        x0 = corner_ref[f + 1]
        y0a = pl.multiple_of((y0 // 8) * 8, 8)
        x0a = pl.multiple_of((x0 // 128) * 128, 128)
        dx = x0 - x0a
        for src, dst in ((a_ref, ao), (b_ref, bo), (c_ref, co), (d_ref, do)):
            two = src[0, pl.ds(y0a, PY), pl.ds(x0a, 256)]   # (PY, 256)
            rolled = pltpu.roll(two, -dx, 1)
            dst[0, k] = rolled[:, :PX]
        return 0

    jax.lax.fori_loop(0, BF, body, 0)


@jax.jit
def extract(corners, a, b, c, d):
    img_spec = pl.BlockSpec((1, H, WPAD), lambda s, f, *_: (s, 0, 0),
                            memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, BF, PY, PX), lambda s, f, *_: (s, f, 0, 0),
                            memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((S, N, PY, PX), jnp.float32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(S, N // BF),
        in_specs=[img_spec] * 4,
        out_specs=[out_spec] * 4,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[out_shape] * 4,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
    )(corners, a, b, c, d)


t0 = time.perf_counter()
outs = extract(corners, *imgs)
jax.block_until_ready(outs)
print(f"compile+run: {time.perf_counter() - t0:.1f}s", file=sys.stderr)

o0 = np.asarray(outs[0])
for s in (0, S - 1):
    for f in (0, 5, N - 1):
        y0, x0 = ys[s, f], xs[s, f]
        y0a = (y0 // 8) * 8
        ref = imgs_pad[0, s, y0a:y0a + PY, x0:x0 + PX]
        np.testing.assert_array_equal(o0[s, f], ref)
print("correctness OK", file=sys.stderr)

reps = 50
t0 = time.perf_counter()
for _ in range(reps):
    outs = extract(corners, *imgs)
jax.block_until_ready(outs)
dt = (time.perf_counter() - t0) / reps * 1e3
print(f"pallas aligned+roll extract (S{S} N{N} 4x{PY}x{PX}): {dt:.3f} ms")

# xla reference cost
def one(img, c):
    return jax.lax.dynamic_slice(img, (c[0], c[1]), (PY, PX))

@jax.jit
def extract_xla(cs, a, b, c, d):
    cs = cs.reshape(S, N, 2)
    return [jax.vmap(jax.vmap(one, in_axes=(None, 0)))(img, cs)
            for img in (a, b, c, d)]

o2 = extract_xla(corners, *imgs)
jax.block_until_ready(o2)
t0 = time.perf_counter()
for _ in range(reps):
    o2 = extract_xla(corners, *imgs)
jax.block_until_ready(o2)
print(f"xla vmapped dynamic_slice:                  {(time.perf_counter()-t0)/reps*1e3:.3f} ms")
