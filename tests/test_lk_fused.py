"""Interpret-mode parity tests for the fused LK-level Pallas kernel
(svo_tpu/ops/lk_pallas.py) against the XLA level path in ops/klt.py.

Same contract as tests/test_klt_pallas.py: on CPU the kernel runs under
pl.pallas_call(interpret=True) on lane-tile-padded images (reproducing the
TPU physical layout); the XLA `_track_impl` path is the reference."""

import numpy as np
import jax.numpy as jnp
import pytest

from svo_tpu.config import KltParams
from svo_tpu.ops.klt import KltTracker, _PAD_X, _PAD_Y, _level_rows
from svo_tpu.ops.lk_pallas import lk_track_level


def _world(rng, H, W, smooth=2):
    img = np.kron(
        rng.uniform(40, 215, (H // 4, W // 4)).astype(np.float32),
        np.ones((4, 4), np.float32),
    )
    img = img + rng.uniform(-10, 10, img.shape).astype(np.float32)
    for _ in range(smooth):
        img = 0.25 * (
            np.roll(img, 1, 0) + np.roll(img, -1, 0)
            + np.roll(img, 1, 1) + np.roll(img, -1, 1)
        )
    return img.astype(np.float32)


def _shifted(img, shift):
    from scipy.ndimage import map_coordinates

    H, W = img.shape
    gy, gx = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    return map_coordinates(
        img, [gy - shift[1], gx - shift[0]], order=1, mode="nearest"
    ).astype(np.float32)


def _run_level(img, curr, pos, valid, window, guess=None, max_iters=12):
    """Run level-0 tracking through BOTH paths; return results + masks."""
    N = pos.shape[0]
    params = KltParams(window=window, max_level=0, max_iters=max_iters)
    prev_pyr = KltTracker.build_pyramid(jnp.asarray(img), 0)
    curr_pyr = KltTracker.build_pyramid(jnp.asarray(curr), 0)
    g = jnp.zeros((N, 2), jnp.float32) if guess is None else jnp.asarray(guess)
    res_xla = KltTracker.track(
        prev_pyr, curr_pyr, jnp.asarray(pos), jnp.asarray(valid), params,
        init_flow=g,
    )
    img_p = prev_pyr[0][0]
    gxp, gyp = prev_pyr[1][0]
    cur_p = curr_pyr[0][0]
    py = _level_rows(window, img_p.shape[0])
    # guess entering level 0 of _track_impl: init / 2^(L+1) doubled once
    p_pad = jnp.asarray(pos) + jnp.asarray([_PAD_X, _PAD_Y], jnp.float32)
    d_k, me_k, solv_k, inp_k = lk_track_level(
        img_p, gxp, gyp, cur_p, p_pad, g, jnp.asarray(valid),
        window=window, py=py, max_iters=max_iters,
        eps=params.eps, min_eig_threshold=params.min_eig_threshold,
        interpret=True,
    )
    d_xla = np.asarray(res_xla.pos) - pos
    return res_xla, np.asarray(d_k), np.asarray(me_k), (
        np.asarray(solv_k), np.asarray(inp_k)
    ), d_xla


@pytest.mark.parametrize("window", [21, 11])
def test_fused_level_matches_xla_interior(rng, window):
    H, W = 192, 512 - 2 * _PAD_X
    img = _world(rng, H, W)
    shift = np.array([1.3, -0.8], np.float32)
    curr = _shifted(img, shift)
    N = 64
    pos = np.stack(
        [rng.uniform(30, W - 30, N), rng.uniform(30, H - 30, N)], -1
    ).astype(np.float32)
    valid = np.ones(N, bool)
    res_xla, d_k, me_k, (solv, inp), d_xla = _run_level(
        img, curr, pos, valid, window
    )
    ok = np.asarray(res_xla.status) & solv & inp
    assert ok.sum() >= N * 0.9
    assert np.abs(d_k - d_xla)[ok].max() < 1e-3
    assert np.abs(d_k[ok] - shift).max() < 0.1
    assert np.abs(me_k - np.asarray(res_xla.err))[ok].max() < 1e-2


def test_fused_level_nonzero_guess_and_dead_slots(rng):
    H, W = 192, 512 - 2 * _PAD_X
    img = _world(rng, H, W)
    shift = np.array([4.6, 3.2], np.float32)  # beyond one-level reach unaided
    curr = _shifted(img, shift)
    N = 64
    pos = np.stack(
        [rng.uniform(40, W - 40, N), rng.uniform(40, H - 40, N)], -1
    ).astype(np.float32)
    valid = np.ones(N, bool)
    valid[::5] = False
    guess = np.tile(shift * 0.8, (N, 1)).astype(np.float32)
    res_xla, d_k, me_k, (solv, inp), d_xla = _run_level(
        img, curr, pos, valid, 21, guess=guess
    )
    ok = np.asarray(res_xla.status) & solv & inp
    assert ok.sum() >= valid.sum() * 0.9
    assert not solv[~valid].any()          # dead slots stay dead
    assert np.abs(d_k - d_xla)[ok].max() < 1e-3
    assert np.abs(d_k[ok] - shift).max() < 0.1


def test_fused_level_border_features_are_killed_not_wrong(rng):
    """Features whose windows clamp at patch borders must be flagged out,
    never returned with silently-garbage flow."""
    H, W = 192, 512 - 2 * _PAD_X
    img = _world(rng, H, W)
    curr = _shifted(img, np.array([0.7, 0.4], np.float32))
    # positions hugging every border of the TRUE image
    edge = np.array(
        [[1.0, 1.0], [W - 2.0, 1.0], [1.0, H - 2.0], [W - 2.0, H - 2.0],
         [W - 2.0, H / 2], [1.0, H / 2], [W / 2, H - 2.0], [W / 2, 1.0]],
        np.float32,
    )
    N = 32
    pos = np.concatenate([edge, np.stack(
        [rng.uniform(40, W - 40, N - len(edge)),
         rng.uniform(40, H - 40, N - len(edge))], -1).astype(np.float32)])
    valid = np.ones(N, bool)
    shift = np.array([0.7, 0.4], np.float32)
    res_xla, d_k, me_k, (solv, inp), d_xla = _run_level(
        img, curr, pos, valid, 21
    )
    ok = np.asarray(res_xla.status) & solv & inp
    # no kept feature carries garbage flow (border-clamped features may
    # freeze ~0.05 px earlier than the XLA path's wider travel clamp —
    # the documented semantic difference — but never diverge)
    assert np.abs(d_k[ok] - shift).max() < 0.1
    # interior features agree with the XLA path exactly
    interior = ok.copy()
    interior[: len(edge)] = False
    assert np.abs(d_k - d_xla)[interior].max() < 1e-3
    # interior features all survive
    assert interior.sum() >= (N - len(edge)) * 0.9


def test_fused_level_stereo_margin(rng):
    """Stereo-matcher geometry: window 11, margin_x=16 — the wide
    negative-x disparity budget must be honored by the per-axis margins
    (ADVICE r03: the old kernel silently shrank it)."""
    H, W = 192, 512 - 2 * _PAD_X
    # broad smooth blobs: the single-level convergence basin must span the
    # 7.5 px displacement (the real stereo matcher has the pyramid chain)
    img = _world(rng, H, W, smooth=6)
    # -7.5 px leftward flow: beyond the OLD kernel's symmetric +-6 budget
    # (o = 6 + 7.5 > R = 12 would freeze), within the stereo margin 16
    shift = np.array([-7.5, 0.4], np.float32)
    curr = _shifted(img, shift)
    N = 64
    pos = np.stack(
        [rng.uniform(40, W - 40, N), rng.uniform(40, H - 40, N)], -1
    ).astype(np.float32)
    valid = np.ones(N, bool)

    params = KltParams(window=11, max_level=0, max_iters=24, margin_x=16)
    prev_pyr = KltTracker.build_pyramid(jnp.asarray(img), 0)
    curr_pyr = KltTracker.build_pyramid(jnp.asarray(curr), 0)
    res_xla = KltTracker.track(
        prev_pyr, curr_pyr, jnp.asarray(pos), jnp.asarray(valid), params,
    )
    img_p = prev_pyr[0][0]
    gxp, gyp = prev_pyr[1][0]
    cur_p = curr_pyr[0][0]
    py = _level_rows(11, img_p.shape[0])
    p_pad = jnp.asarray(pos) + jnp.asarray([_PAD_X, _PAD_Y], jnp.float32)
    d_k, me_k, solv, inp = lk_track_level(
        img_p, gxp, gyp, cur_p, p_pad, jnp.zeros((N, 2), jnp.float32),
        jnp.asarray(valid), window=11, py=py, max_iters=24,
        eps=params.eps, min_eig_threshold=params.min_eig_threshold,
        margin_x=16, margin_y=6, interpret=True,
    )
    d_k, solv, inp = np.asarray(d_k), np.asarray(solv), np.asarray(inp)
    d_xla = np.asarray(res_xla.pos) - pos
    # consider only features BOTH paths tracked to the true displacement
    # (weak-texture wanderers are killed downstream by the y-gate/fb-check)
    ok = (
        np.asarray(res_xla.status) & solv & inp
        & (np.abs(d_xla - shift).max(-1) < 0.25)
    )
    # single-level LK from 7.5 px away converges for only part of the
    # population (no pyramid chain here); the assertion under test is the
    # travel BUDGET + parity, not basin size
    assert ok.sum() >= N * 0.35, f"large-disparity tracks lost: {ok.sum()}"
    assert np.abs(d_k[ok] - shift).max() < 0.3
    assert np.abs(d_k - d_xla)[ok].max() < 0.1


def test_fused_level_batched_rule_matches_loop(rng):
    """The custom_vmap batched kernel must equal per-stream invocations."""
    import jax

    H, W = 192, 512 - 2 * _PAD_X
    S, N = 3, 32
    imgs, currs = [], []
    for s in range(S):
        img = _world(np.random.default_rng(100 + s), H, W)
        imgs.append(img)
        currs.append(_shifted(img, np.array([0.9 + 0.3 * s, -0.5], np.float32)))
    pos = np.stack([
        np.stack([rng.uniform(30, W - 30, N), rng.uniform(30, H - 30, N)], -1)
        for _ in range(S)
    ]).astype(np.float32)
    valid = np.ones((S, N), bool)

    prev_p, gx_p, gy_p, cur_p, py = [], [], [], [], None
    for s in range(S):
        pp = KltTracker.build_pyramid(jnp.asarray(imgs[s]), 0)
        cp = KltTracker.build_pyramid(jnp.asarray(currs[s]), 0)
        prev_p.append(pp[0][0]); gx_p.append(pp[1][0][0])
        gy_p.append(pp[1][0][1]); cur_p.append(cp[0][0])
        py = _level_rows(21, pp[0][0].shape[0])
    prev_p, gx_p, gy_p, cur_p = map(jnp.stack, (prev_p, gx_p, gy_p, cur_p))
    p_pad = jnp.asarray(pos) + jnp.asarray([_PAD_X, _PAD_Y], jnp.float32)
    zeros = jnp.zeros((S, N, 2), jnp.float32)

    def one(pr, gx, gy, cu, pp, g, v):
        return lk_track_level(
            pr, gx, gy, cu, pp, g, v, window=21, py=py, max_iters=8,
            eps=1e-3, min_eig_threshold=1e-4, interpret=True,
        )

    batched = jax.vmap(one)(
        prev_p, gx_p, gy_p, cur_p, p_pad, zeros, jnp.asarray(valid)
    )
    for s in range(S):
        single = one(prev_p[s], gx_p[s], gy_p[s], cur_p[s], p_pad[s],
                     zeros[s], jnp.asarray(valid[s]))
        for b, o in zip(batched, single):
            # rtol: the kernel's selector-matmul reductions may associate
            # differently between the (S, blocks) and (blocks,) grids
            np.testing.assert_allclose(
                np.asarray(b[s]), np.asarray(o), atol=1e-5, rtol=1e-5
            )
