"""Interpret-mode parity tests for the Pallas KLT patch-extraction kernel.

The kernel (ops/klt_pallas.py) carries an alignment contract — sublane-
aligned row starts, 256-lane span reads rolled to the exact x, a hand-
written custom_vmap batching rule — that until round 3 was exercised only by
the TPU bench and validated solely by end-to-end ATE. These tests run the
SAME kernel through pl.pallas_call(interpret=True) on CPU and check it
against _extract_patches_xla (the dynamic_slice reference the CPU pipeline
path uses), so a broken contract fails a test, not a benchmark.

TPU physical-layout note: the kernel's 256-lane span reads rely on images
being padded to the 128-lane tile in TPU memory. Interpret mode does not
emulate that padding, so the tests pad images to a 128 multiple themselves —
with RANDOM GARBAGE, not zeros, in the pad lanes, proving the roll
arithmetic never lets out-of-image lanes leak into a kept window.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from svo_tpu.ops.klt import _extract_patches_xla
from svo_tpu.ops.klt_pallas import extract_klt_patches

PY, PX = 48, 64  # the temporal-KLT (window 21) patch geometry


def _mk_images(rng, H, W_true):
    """Four level images + a garbage-padded copy for the interpret kernel."""
    imgs = [
        rng.uniform(0.0, 255.0, (H, W_true)).astype(np.float32)
        for _ in range(4)
    ]
    W_pad = ((W_true + 127) // 128) * 128
    padded = []
    for im in imgs:
        garbage = rng.uniform(-1e4, 1e4, (H, W_pad - W_true)).astype(np.float32)
        padded.append(np.concatenate([im, garbage], axis=1))
    return imgs, padded


def _corners(rng, n, H, W_true, include_edges=True):
    """Contract-satisfying corners: y multiples of 8 in [0, H-PY],
    x exact in [0, W_true-PX]; first few rows pinned to the edge cases."""
    ty = (rng.integers(0, (H - PY) // 8 + 1, n) * 8).astype(np.int32)
    tx = rng.integers(0, W_true - PX + 1, n).astype(np.int32)
    cy = (rng.integers(0, (H - PY) // 8 + 1, n) * 8).astype(np.int32)
    cx = rng.integers(0, W_true - PX + 1, n).astype(np.int32)
    if include_edges and n >= 6:
        # borders + exactly-aligned and maximally-unaligned x
        tx[0], ty[0] = 0, 0
        tx[1], ty[1] = W_true - PX, ((H - PY) // 8) * 8
        tx[2] = 128          # x0 % 128 == 0 (zero roll)
        tx[3] = 127          # roll of 127
        cx[4] = 255
        cy[5] = 0
    return ty, tx, cy, cx


def _reference(imgs, ty, tx, cy, cx, valid):
    tc = jnp.stack([jnp.asarray(ty), jnp.asarray(tx)], -1)
    cc = jnp.stack([jnp.asarray(cy), jnp.asarray(cx)], -1)
    outs = [
        _extract_patches_xla(jnp.asarray(imgs[k]), tc, PY, PX)
        for k in range(3)
    ]
    outs.append(_extract_patches_xla(jnp.asarray(imgs[3]), cc, PY, PX))
    v = np.asarray(valid)[:, None, None]
    return [np.asarray(o) * v for o in outs]


@pytest.mark.parametrize("W_true", [500, 512])
def test_kernel_matches_xla_extraction(W_true):
    """Exact parity vs dynamic_slice across aligned/unaligned x, borders,
    and an unaligned image width (physical-tile emulation)."""
    rng = np.random.default_rng(3)
    H, N = 128, 40  # N not a multiple of the 32-feature block -> padding path
    imgs, padded = _mk_images(rng, H, W_true)
    ty, tx, cy, cx = _corners(rng, N, H, W_true)
    valid = np.ones(N, bool)
    valid[7] = False  # dead slot must come back zeroed

    got = extract_klt_patches(
        *[jnp.asarray(p) for p in padded],
        jnp.asarray(ty), jnp.asarray(tx), jnp.asarray(cy), jnp.asarray(cx),
        jnp.asarray(valid), py=PY, px=PX, interpret=True,
    )
    want = _reference(imgs, ty, tx, cy, cx, valid)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), w)


def test_kernel_batched_custom_vmap_rule():
    """jax.vmap must dispatch the natively batched kernel (grid (S, N/BF))
    and agree with S independent single-stream calls."""
    rng = np.random.default_rng(4)
    S, H, W_true, N = 3, 96, 500, 32
    per_stream = []
    all_imgs, all_corners, all_valid = [], [], []
    for s in range(S):
        imgs, padded = _mk_images(rng, H, W_true)
        ty, tx, cy, cx = _corners(rng, N, H, W_true)
        valid = np.ones(N, bool)
        valid[s] = False
        per_stream.append(_reference(imgs, ty, tx, cy, cx, valid))
        all_imgs.append(padded)
        all_corners.append((ty, tx, cy, cx))
        all_valid.append(valid)

    stacked_imgs = [
        jnp.asarray(np.stack([all_imgs[s][k] for s in range(S)]))
        for k in range(4)
    ]
    stacked_c = [
        jnp.asarray(np.stack([all_corners[s][k] for s in range(S)]))
        for k in range(4)
    ]
    stacked_v = jnp.asarray(np.stack(all_valid))

    fn = jax.vmap(
        lambda p, gx, gy, c, a, b, d, e, v: extract_klt_patches(
            p, gx, gy, c, a, b, d, e, v, py=PY, px=PX, interpret=True
        )
    )
    got = fn(*stacked_imgs, *stacked_c, stacked_v)
    for k in range(4):
        gk = np.asarray(got[k])
        assert gk.shape == (S, N, PY, PX)
        for s in range(S):
            np.testing.assert_array_equal(gk[s], per_stream[s][k])


def test_patch_extraction_selftest_zero_diff():
    """The bench's on-chip A/B helper must report exact parity here too
    (CPU -> interpret mode on a garbage-padded lane-tile copy)."""
    from svo_tpu.ops.klt import patch_extraction_selftest

    rng = np.random.default_rng(6)
    img = rng.uniform(0, 255, (120, 300)).astype(np.float32)
    assert patch_extraction_selftest(img, n=48) == 0.0


def test_kernel_all_invalid_returns_zeros():
    rng = np.random.default_rng(5)
    H, W_true, N = 96, 512, 32
    _, padded = _mk_images(rng, H, W_true)
    ty, tx, cy, cx = _corners(rng, N, H, W_true, include_edges=False)
    got = extract_klt_patches(
        *[jnp.asarray(p) for p in padded],
        jnp.asarray(ty), jnp.asarray(tx), jnp.asarray(cy), jnp.asarray(cx),
        jnp.zeros(N, bool), py=PY, px=PX, interpret=True,
    )
    for g in got:
        assert not np.asarray(g).any()
