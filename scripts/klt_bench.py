"""KLT microbenchmark with LIVE features on realistic texture (the earlier
microbench used an empty validity mask, which short-circuits the tracker).
Measures temporal and stereo call sites + pyramid build, warm."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")
_ = jax.devices()

import jax.numpy as jnp
import numpy as np

from svo_tpu.config import KltParams
from svo_tpu.ops.klt import KltTracker

H, W, N = 376, 1241, 256
rng = np.random.default_rng(0)

# smooth-but-textured synthetic image pair with known shift
base = rng.uniform(0, 255, (H // 4 + 1, W // 4 + 1)).astype(np.float32)
img0 = np.kron(base, np.ones((4, 4), np.float32))[:H, :W]
img0 += rng.uniform(-10, 10, (H, W)).astype(np.float32)
for _ in range(2):
    img0 = 0.25 * (
        np.roll(img0, 1, 0) + np.roll(img0, -1, 0)
        + np.roll(img0, 1, 1) + np.roll(img0, -1, 1)
    )
img1 = np.roll(img0, (2, 5), (0, 1)) * 0.99 + 1.3

pos = np.stack(
    [rng.uniform(40, W - 40, N), rng.uniform(40, H - 40, N)], -1
).astype(np.float32)
valid = jnp.ones((N,), bool)
pos = jnp.asarray(pos)
i0 = jnp.asarray(img0)
i1 = jnp.asarray(img1)


def bench(name, fn, *a, reps=20):
    out = fn(*a)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*a)
    jax.block_until_ready(out)
    print(f"{name:42s} {(time.perf_counter()-t0)/reps*1e3:8.2f} ms", flush=True)
    return out


pyr_f = jax.jit(lambda im: KltTracker.build_pyramid(im, 3))
p0 = pyr_f(i0)
p1 = pyr_f(i1)
bench("pyramid+grads", pyr_f, i0)

for name, params in [
    ("temporal 21x21/12it", KltParams(window=21, max_level=3, max_iters=12)),
    ("temporal 21x21/8it", KltParams(window=21, max_level=3, max_iters=8)),
    ("stereo 11x11/12it", KltParams(window=11, max_level=3, max_iters=12)),
]:
    f = jax.jit(lambda a, b, p, v, prm=params: KltTracker.track(a, b, p, v, prm))
    out = bench(f"KLT {name} (256 live feats)", f, p0, p1, pos, valid)
    st = np.asarray(out.status)
    flow = np.asarray(out.pos) - np.asarray(pos)
    err = np.linalg.norm(flow[st] - np.array([5.0, 2.0]), axis=-1)
    print(f"    survived {st.mean()*100:.0f}%  median err {np.median(err):.3f}px")
