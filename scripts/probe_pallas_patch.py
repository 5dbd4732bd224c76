"""Empirical probe: Pallas VMEM patch extraction on the current backend.

Tests that Mosaic supports dynamic slices with arbitrary (unaligned) starts
in both sublane and lane dims from a VMEM-resident image, and times the
batched extraction kernel shape the KLT tracker needs:
(S,H,W) images + (S,N) features -> (S,N,PY,PX) patches x 4 arrays.
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
BF = 32          # features per grid step
PY, PX = 40, 48  # patch block

rng = np.random.default_rng(0)
imgs = [jnp.asarray(rng.uniform(0, 255, (S, H, W)).astype(np.float32)) for _ in range(4)]
ys = rng.integers(0, H - PY, (S, N)).astype(np.int32)
xs = rng.integers(0, W - PX, (S, N)).astype(np.int32)
corners = jnp.asarray(np.stack([ys, xs], -1).reshape(-1))  # (S*N*2,)


def kernel(corner_ref, a_ref, b_ref, c_ref, d_ref, ao, bo, co, do):
    s = pl.program_id(0)
    blk = pl.program_id(1)

    def body(k, _):
        f = (s * N + blk * BF + k) * 2
        y0 = corner_ref[f]
        x0 = corner_ref[f + 1]
        for src, dst in ((a_ref, ao), (b_ref, bo), (c_ref, co), (d_ref, do)):
            dst[0, k] = src[0, pl.ds(y0, PY), pl.ds(x0, PX)]
        return 0

    jax.lax.fori_loop(0, BF, body, 0)


@jax.jit
def extract(corners, a, b, c, d):
    img_spec = pl.BlockSpec((1, H, W), lambda s, f, *_: (s, 0, 0),
                            memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, BF, PY, PX), lambda s, f, *_: (s, f, 0, 0),
                            memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((S, N, PY, PX), jnp.float32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(S, N // BF),
        in_specs=[img_spec, img_spec, img_spec, img_spec],
        out_specs=[out_spec] * 4,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[out_shape] * 4,
    )(corners, a, b, c, d)


t0 = time.perf_counter()
outs = extract(corners, *imgs)
jax.block_until_ready(outs)
print(f"compile+run: {time.perf_counter() - t0:.1f}s", file=sys.stderr)

# correctness
o0 = np.asarray(outs[0])
for s in (0, S - 1):
    for f in (0, 5, N - 1):
        ref = np.asarray(imgs[0])[s, ys[s, f]:ys[s, f] + PY, xs[s, f]:xs[s, f] + PX]
        np.testing.assert_array_equal(o0[s, f], ref)
print("correctness OK", file=sys.stderr)

t0 = time.perf_counter()
reps = 50
for _ in range(reps):
    outs = extract(corners, *imgs)
jax.block_until_ready(outs)
dt = (time.perf_counter() - t0) / reps * 1e3
print(f"pallas extract (S={S},N={N},4 arrays,{PY}x{PX}): {dt:.3f} ms")

# compare: the current vmapped dynamic_slice path
def one(img, c):
    return jax.lax.dynamic_slice(img, (c[0], c[1]), (PY, PX))

@jax.jit
def extract_xla(corners, a, b, c, d):
    cs = corners.reshape(S, N, 2)
    outs = []
    for img in (a, b, c, d):
        outs.append(jax.vmap(jax.vmap(one, in_axes=(None, 0)))(img, cs))
    return outs

o2 = extract_xla(corners, *imgs)
jax.block_until_ready(o2)
t0 = time.perf_counter()
for _ in range(reps):
    o2 = extract_xla(corners, *imgs)
jax.block_until_ready(o2)
dt2 = (time.perf_counter() - t0) / reps * 1e3
print(f"xla vmapped dynamic_slice:              {dt2:.3f} ms")
