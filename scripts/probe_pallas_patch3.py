"""Probe 3: single-image Pallas patch kernel + jax.vmap over streams.

The production tracker is vmapped over streams by parallel/batched.py, so
pallas_call must have a working batching rule (including the scalar-prefetch
corners). Also times the single-stream kernel (the latency path).
"""

import functools
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
PY, PX = 48, 64
WT = ((W + 127) // 128) * 128  # physical lane tiles


def _kernel(corner_ref, a_ref, b_ref, c_ref, d_ref, ao, bo, co, do, *, n, bf, py, px):
    blk = pl.program_id(0)
    x0a_max = WT - 256

    def body(k, _):
        f = (blk * bf + k) * 4
        ty = corner_ref[f]
        tx = corner_ref[f + 1]
        cy = corner_ref[f + 2]
        cx = corner_ref[f + 3]
        for y0, x0, src, dst in (
            (ty, tx, a_ref, ao), (ty, tx, b_ref, bo), (ty, tx, c_ref, co),
            (cy, cx, d_ref, do),
        ):
            y0a = pl.multiple_of((y0 // 8) * 8, 8)
            x0a = pl.multiple_of(jnp.minimum((x0 // 128) * 128, x0a_max), 128)
            two = src[pl.ds(y0a, py), pl.ds(x0a, 256)]
            rolled = pltpu.roll(two, -(x0 - x0a), 1)
            dst[k] = rolled[:, :px]
        return 0

    jax.lax.fori_loop(0, bf, body, 0)


def extract(corners, a, b, c, d):
    """corners: (N,4) i32 [ty, tx, cy, cx]; images (H,W). Returns 4x
    (N,PY,PX) patches with top-left ((y//8)*8, x)."""
    img_spec = pl.BlockSpec((H, W), lambda f, *_: (0, 0), memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((BF, PY, PX), lambda f, *_: (f, 0, 0),
                            memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((N, PY, PX), jnp.float32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(N // BF,),
        in_specs=[img_spec] * 4,
        out_specs=[out_spec] * 4,
    )
    return pl.pallas_call(
        functools.partial(_kernel, n=N, bf=BF, py=PY, px=PX),
        grid_spec=grid_spec,
        out_shape=[out_shape] * 4,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )(corners.reshape(-1), a, b, c, d)


rng = np.random.default_rng(0)
imgs = [jnp.asarray(rng.uniform(0, 255, (H, W)).astype(np.float32)) for _ in range(4)]
ys = rng.integers(0, H - PY, (N,)).astype(np.int32)
xs = rng.integers(0, W - PX, (N,)).astype(np.int32)
cy = rng.integers(0, H - PY, (N,)).astype(np.int32)
cx = rng.integers(0, W - PX, (N,)).astype(np.int32)
corners = jnp.asarray(np.stack([ys, xs, cy, cx], -1))

f1 = jax.jit(extract)
outs = jax.block_until_ready(f1(corners, *imgs))
o0, o3 = np.asarray(outs[0]), np.asarray(outs[3])
for f in (0, 7, N - 1):
    y0a = (ys[f] // 8) * 8
    np.testing.assert_array_equal(
        o0[f], np.asarray(imgs[0])[y0a:y0a + PY, xs[f]:xs[f] + PX])
    cy0a = (cy[f] // 8) * 8
    np.testing.assert_array_equal(
        o3[f], np.asarray(imgs[3])[cy0a:cy0a + PY, cx[f]:cx[f] + PX])
print("single-stream correctness OK", file=sys.stderr)

reps = 50
t0 = time.perf_counter()
for _ in range(reps):
    outs = f1(corners, *imgs)
jax.block_until_ready(outs)
print(f"single-stream extract: {(time.perf_counter()-t0)/reps*1e3:.3f} ms")

# ---- vmap over streams ----
imgsS = [jnp.asarray(rng.uniform(0, 255, (S, H, W)).astype(np.float32))
         for _ in range(4)]
cS = jnp.asarray(
    np.stack([np.stack([ys, xs, cy, cx], -1)] * S)
)  # same corners per stream, content differs
fS = jax.jit(jax.vmap(extract))
try:
    outsS = jax.block_until_ready(fS(cS, *imgsS))
    oS = np.asarray(outsS[0])
    for s in (0, S - 1):
        for f in (0, N - 1):
            y0a = (ys[f] // 8) * 8
            np.testing.assert_array_equal(
                oS[s, f],
                np.asarray(imgsS[0])[s, y0a:y0a + PY, xs[f]:xs[f] + PX])
    print("vmap correctness OK", file=sys.stderr)
    t0 = time.perf_counter()
    for _ in range(reps):
        outsS = fS(cS, *imgsS)
    jax.block_until_ready(outsS)
    print(f"vmapped x{S} extract:  {(time.perf_counter()-t0)/reps*1e3:.3f} ms")
except Exception as e:  # noqa: BLE001
    print(f"VMAP FAILED: {type(e).__name__}: {str(e)[:400]}")
