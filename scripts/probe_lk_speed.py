"""Micro-profile the fused LK level kernel (ops/lk_pallas.py) on the chip.

Times lk_track_level at pipeline shapes while sweeping the iteration count
(max_iters=0 isolates the per-feature setup loop + one sampling pass) and
the features-per-grid-step block size _BF. Compares against the XLA
extraction+blend path for the same level geometry.

    python scripts/probe_lk_speed.py
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

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from svo_tpu.ops import lk_pallas  # noqa: E402
from svo_tpu.ops.klt import _PAD_X, _PAD_Y  # noqa: E402
from svo_tpu.ops.pyramid import scharr_gradients  # noqa: E402

H, W = 376, 1241
N = 128
WIN = 21
PY = 40
rng = np.random.default_rng(0)

img = rng.uniform(0, 255, (H + 2 * _PAD_Y, W + 2 * _PAD_X)).astype(np.float32)
prev = jnp.asarray(img)
curr = jnp.asarray(img + rng.normal(0, 1, img.shape).astype(np.float32))
gx, gy = scharr_gradients(prev)
Hp, Wp = prev.shape

pos = jnp.asarray(
    np.stack([rng.uniform(50, Wp - 50, N), rng.uniform(50, Hp - 50, N)], -1)
    .astype(np.float32)
)
guess = jnp.asarray(rng.uniform(-2, 2, (N, 2)).astype(np.float32))
valid = jnp.ones((N,), bool)


def timeit(fn, *a, reps=20, **k):
    out = fn(*a, **k)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*a, **k)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps * 1e3


S = int(os.environ.get("PROBE_STREAMS", "1"))
if S > 1:
    prevS = jnp.broadcast_to(prev, (S,) + prev.shape)
    currS = jnp.broadcast_to(curr, (S,) + curr.shape)
    gxS = jnp.broadcast_to(gx, (S,) + gx.shape)
    gyS = jnp.broadcast_to(gy, (S,) + gy.shape)
    posS = jnp.broadcast_to(pos, (S,) + pos.shape)
    guessS = jnp.broadcast_to(guess, (S,) + guess.shape)
    validS = jnp.broadcast_to(valid, (S,) + valid.shape)

_skip_sweep = any(
    os.environ.get(k) for k in
    ("PROBE_SCAN", "PROBE_SCAN2", "PROBE_SCAN3", "PROBE_NOSCAN",
     "PROBE_REAL", "PROBE_SCANIT", "PROBE_BF")
)
for bf in () if _skip_sweep else (32, 64, 128):
    lk_pallas._BF = bf
    lk_pallas._make_track.cache_clear()
    for iters in (0, 10, 30):
        f = jax.jit(
            lambda p, g1, g2, c, po, gu, v: lk_pallas.lk_track_level(
                p, g1, g2, c, po, gu, v,
                window=WIN, py=PY, max_iters=iters, eps=1e-3,
                min_eig_threshold=1e-4, margin_x=6, margin_y=6,
            )
        )
        if S > 1:
            fv = jax.jit(jax.vmap(
                lambda p, g1, g2, c, po, gu, v: lk_pallas.lk_track_level(
                    p, g1, g2, c, po, gu, v,
                    window=WIN, py=PY, max_iters=iters, eps=1e-3,
                    min_eig_threshold=1e-4, margin_x=6, margin_y=6,
                )
            ))
            ms = timeit(fv, prevS, gxS, gyS, currS, posS, guessS, validS)
        else:
            ms = timeit(f, prev, gx, gy, curr, pos, guess, valid)
        print(f"S={S} BF={bf:3d} iters={iters:2d}: {ms:7.3f} ms", flush=True)
lk_pallas._BF = 32
lk_pallas._make_track.cache_clear()

# --- scan-wrapped variant: does lax.scan around the call change its cost? ---
if os.environ.get("PROBE_SCAN"):
    S2 = max(S, 1)
    iters = 30
    if S2 > 1:
        imgs = (prevS, gxS, gyS, currS)
        po, gu, va = posS, guessS, validS
    else:
        imgs = (prev, gx, gy, curr)
        po, gu, va = pos, guess, valid

    def body(carry, _):
        p, g1, g2, c, cpo = carry
        fn = lambda *a: lk_pallas.lk_track_level(
            *a, window=WIN, py=PY, max_iters=iters, eps=1e-3,
            min_eig_threshold=1e-4, margin_x=6, margin_y=6,
        )
        if S2 > 1:
            d, me, so, inp = jax.vmap(fn)(p, g1, g2, c, cpo, gu, va)
        else:
            d, me, so, inp = fn(p, g1, g2, c, cpo, gu, va)
        # feed outputs back so the scan carries a data dependency
        cpo = cpo + 0.0 * d
        p = p + 0.001
        return (p, g1, g2, c, cpo), me.sum()

    @jax.jit
    def scan12(p, g1, g2, c, cpo):
        (p, *_), outs = jax.lax.scan(
            body, (p, g1, g2, c, cpo), None, length=12
        )
        return outs

    ms = timeit(scan12, *imgs[:1], *imgs[1:], po, reps=5)
    print(f"S={S2} scan12 iters=30: {ms:7.2f} ms total ({ms/12:.3f} ms/call)")

# --- variant: images CLOSED OVER (top-level constants), only pos varies ---
if os.environ.get("PROBE_SCAN2"):
    S2 = max(S, 1)
    iters = 30
    imgs = (prevS, gxS, gyS, currS) if S2 > 1 else (prev, gx, gy, curr)
    po, gu, va = (posS, guessS, validS) if S2 > 1 else (pos, guess, valid)

    def body2(cpo, _):
        fn = lambda *a: lk_pallas.lk_track_level(
            *a, window=WIN, py=PY, max_iters=iters, eps=1e-3,
            min_eig_threshold=1e-4, margin_x=6, margin_y=6,
        )
        if S2 > 1:
            d, me, so, inp = jax.vmap(fn)(*imgs, cpo, gu, va)
        else:
            d, me, so, inp = fn(*imgs, cpo, gu, va)
        return cpo + 0.0 * d, me.sum()

    @jax.jit
    def scan12b(cpo):
        _, outs = jax.lax.scan(body2, cpo, None, length=12)
        return outs

    ms = timeit(scan12b, po, reps=5)
    print(f"S={S2} scan12-CLOSED iters=30: {ms:7.2f} ms ({ms/12:.3f} ms/call)")

# --- variant: images computed IN-BODY from a carried image (like pyramids) ---
if os.environ.get("PROBE_SCAN3"):
    S2 = max(S, 1)
    iters = 30
    imgs = (prevS, gxS, gyS, currS) if S2 > 1 else (prev, gx, gy, curr)
    po, gu, va = (posS, guessS, validS) if S2 > 1 else (pos, guess, valid)

    def body3(carry, _):
        base, cpo = carry
        p2 = base + 1.0
        g1 = base * 0.5
        g2 = base * 0.25
        c2 = base + 2.0
        fn = lambda *a: lk_pallas.lk_track_level(
            *a, window=WIN, py=PY, max_iters=iters, eps=1e-3,
            min_eig_threshold=1e-4, margin_x=6, margin_y=6,
        )
        if S2 > 1:
            d, me, so, inp = jax.vmap(fn)(p2, g1, g2, c2, cpo, gu, va)
        else:
            d, me, so, inp = fn(p2, g1, g2, c2, cpo, gu, va)
        return (base + 0.001, cpo + 0.0 * d), me.sum()

    @jax.jit
    def scan12c(base, cpo):
        _, outs = jax.lax.scan(body3, (base, cpo), None, length=12)
        return outs

    ms = timeit(scan12c, imgs[0], po, reps=5)
    print(f"S={S2} scan12-INBODY iters=30: {ms:7.2f} ms ({ms/12:.3f} ms/call)")

# --- variant: in-body computed images, NO scan (one dispatch) ---
if os.environ.get("PROBE_NOSCAN"):
    S2 = max(S, 1)
    iters = 30
    imgs = (prevS, gxS, gyS, currS) if S2 > 1 else (prev, gx, gy, curr)
    po, gu, va = (posS, guessS, validS) if S2 > 1 else (pos, guess, valid)

    @jax.jit
    def once(base, cpo):
        p2 = base + 1.0
        g1 = base * 0.5
        g2 = base * 0.25
        c2 = base + 2.0
        fn = lambda *a: lk_pallas.lk_track_level(
            *a, window=WIN, py=PY, max_iters=iters, eps=1e-3,
            min_eig_threshold=1e-4, margin_x=6, margin_y=6,
        )
        if S2 > 1:
            d, me, so, inp = jax.vmap(fn)(p2, g1, g2, c2, cpo, gu, va)
        else:
            d, me, so, inp = fn(p2, g1, g2, c2, cpo, gu, va)
        return me.sum()

    ms = timeit(once, imgs[0], po, reps=20)
    print(f"S={S2} INBODY-once iters=30: {ms:7.3f} ms")

# --- variant: REAL distinct per-stream images (no broadcast), standalone;
#     optionally width-padded to a lane multiple ---
if os.environ.get("PROBE_REAL"):
    S2 = max(S, 2)
    iters = 30
    pad_w = int(os.environ.get("PROBE_PADW", "0"))
    base = np.stack([img + rng.normal(0, 1, img.shape) for _ in range(S2)])
    if pad_w:
        Wt = ((base.shape[-1] + 127) // 128) * 128
        base = np.pad(base, ((0, 0), (0, 0), (0, Wt - base.shape[-1])))
    A = jnp.asarray(base.astype(np.float32))
    B = A * 0.5
    C = A * 0.25
    D = A + 1.0
    poR = jnp.broadcast_to(pos, (S2,) + pos.shape)
    guR = jnp.broadcast_to(guess, (S2,) + guess.shape)
    vaR = jnp.broadcast_to(valid, (S2,) + valid.shape)
    fv = jax.jit(jax.vmap(
        lambda p, g1, g2, c, po2, gu2, v2: lk_pallas.lk_track_level(
            p, g1, g2, c, po2, gu2, v2,
            window=WIN, py=PY, max_iters=iters, eps=1e-3,
            min_eig_threshold=1e-4, margin_x=6, margin_y=6,
        )
    ))
    ms = timeit(fv, A, B, C, D, poR, guR, vaR)
    print(f"S={S2} REAL padw={pad_w} iters=30: {ms:7.3f} ms")

# --- scan with variable iters to see what scales ---
if os.environ.get("PROBE_SCANIT"):
    S2 = max(S, 1)
    imgs = (prevS, gxS, gyS, currS) if S2 > 1 else (prev, gx, gy, curr)
    po, gu, va = (posS, guessS, validS) if S2 > 1 else (pos, guess, valid)
    for iters in (1, 10, 30):
        def body(carry, _, it=iters):
            p, g1, g2, c, cpo = carry
            fn = lambda *a: lk_pallas.lk_track_level(
                *a, window=WIN, py=PY, max_iters=it, eps=1e-3,
                min_eig_threshold=1e-4, margin_x=6, margin_y=6,
            )
            if S2 > 1:
                d, me, so, inp = jax.vmap(fn)(p, g1, g2, c, cpo, gu, va)
            else:
                d, me, so, inp = fn(p, g1, g2, c, cpo, gu, va)
            return (p + 0.001, g1, g2, c, cpo + 0.0 * d), me.sum()

        @jax.jit
        def scan12x(p, g1, g2, c, cpo):
            _, outs = jax.lax.scan(body, (p, g1, g2, c, cpo), None, length=12)
            return outs

        ms = timeit(scan12x, *imgs, po, reps=5)
        print(f"S={S2} scanIT iters={iters}: {ms:7.2f} ms ({ms/12:.3f} ms/call)",
              flush=True)

# --- BF sweep on REAL images + scan ---
if os.environ.get("PROBE_BF"):
    S2 = max(S, 2)
    iters = 30
    base = np.stack([img + rng.normal(0, 1, img.shape) for _ in range(S2)])
    A = jnp.asarray(base.astype(np.float32)); B = A*0.5; C = A*0.25; D = A+1.0
    poR = jnp.broadcast_to(pos, (S2,) + pos.shape)
    guR = jnp.broadcast_to(guess, (S2,) + guess.shape)
    vaR = jnp.broadcast_to(valid, (S2,) + valid.shape)
    for bf in (16, 8):
        lk_pallas._BF = bf
        lk_pallas._make_track.cache_clear()
        fv = jax.jit(jax.vmap(
            lambda p, g1, g2, c, po2, gu2, v2: lk_pallas.lk_track_level(
                p, g1, g2, c, po2, gu2, v2,
                window=WIN, py=PY, max_iters=iters, eps=1e-3,
                min_eig_threshold=1e-4, margin_x=6, margin_y=6,
            )
        ))
        try:
            ms = timeit(fv, A, B, C, D, poR, guR, vaR)
            print(f"S={S2} BFREAL bf={bf}: {ms:7.3f} ms", flush=True)
        except Exception as e:
            print(f"S={S2} BFREAL bf={bf}: FAIL {str(e)[:120]}", flush=True)

        def body(carry, _):
            p, cpo = carry
            d, me, so, inp = jax.vmap(
                lambda pp, g1, g2, c, po2, gu2, v2: lk_pallas.lk_track_level(
                    pp, g1, g2, c, po2, gu2, v2,
                    window=WIN, py=PY, max_iters=iters, eps=1e-3,
                    min_eig_threshold=1e-4, margin_x=6, margin_y=6,
                )
            )(p, p*0.5, p*0.25, p+2.0, cpo, guR, vaR)
            return (p + 0.001, cpo + 0.0*d), me.sum()

        @jax.jit
        def scanx(p, cpo):
            _, outs = jax.lax.scan(body, (p, cpo), None, length=12)
            return outs
        try:
            ms = timeit(scanx, A, poR, reps=5)
            print(f"S={S2} BFSCAN bf={bf}: {ms:7.2f} ms ({ms/12:.3f} ms/call)",
                  flush=True)
        except Exception as e:
            print(f"S={S2} BFSCAN bf={bf}: FAIL {str(e)[:120]}", flush=True)
