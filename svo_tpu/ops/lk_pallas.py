"""Fused Pallas TPU kernel: one pyramidal-LK LEVEL per launch.

The round-2 design (ops/klt_pallas.py) used Pallas only for patch
EXTRACTION: each level materialized four (N, py, px) patch tensors to HBM
(~25 MB per call at 8 streams) and the LK math ran as ~150 small XLA ops per
step (one-hot blend einsums + iteration bookkeeping), whose per-op dispatch
overhead dominated the profile. This kernel fuses the whole level:

    load + roll patches into VMEM scratch      (as before, no HBM writes)
    sample template T and gradients Tx, Ty     (2-tap separable blend)
    normal matrix G, min-eigenvalue gate       (batched over the block)
    max_iters LK updates                       (in-VMEM, batched)
    output (N, 8) floats                       (d, flags — KBs, not MBs)

Key geometry change vs the extraction kernel: patches are rolled in BOTH
axes so each window's integer corner lands at a fixed margin row/col. The
iteration then samples at offsets o in [0, R] via a SEPARABLE HAT-TAP blend:

    Iw(o) = sum_j hat(o_y - j) * [ sum_i hat(o_x - i) * P[:, j:j+w, i:i+w] ]

with hat(t) = max(0, 1 - |t|) — exactly bilinear interpolation, but the
slices are STATIC (batched over the 32-feature block, pure VPU work) and the
per-feature fractional+integer offset lives entirely in the weights. Travel
beyond R px from the initial guess marks the feature lost (the XLA path
allows ~13 px before its patch clamp binds; R=12 loses only tracks the
fb-check/RANSAC would reject anyway).

Alignment contract (same as klt_pallas.py): row loads from sublane-aligned
corners, 256-lane spans from lane-aligned corners, both corrected by
pltpu.roll with dynamic shifts.

Reference anchor: cv::calcOpticalFlowPyrLK per-level loop (reference
src/tracking.cpp:98-105, 157-164); numerics mirror ops/klt.py's XLA path
(the CPU/test reference implementation).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import custom_batching
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BF = 32         # features per grid step
_PX = 64         # patch cols held in scratch (loads are 256-lane spans)
_TT = 14         # hat taps: iteration offsets o in [0, R], R = _TT - 2
_MARGIN = 6      # initial integer corner sits at (margin, margin)

_COMPILER_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024)


def _kernel(flt_ref, prev_ref, gx_ref, gy_ref, curr_ref, fltv_ref,
            out_ref, *,
            bf, py, px, wt, iw, ht, w, n_total, batched, max_iters, eps,
            min_eig_threshold, t_scr, gx_scr, gy_scr, c_scr):
    if batched:
        s = pl.program_id(0)
        blk = pl.program_id(1)
        base = s * n_total
    else:
        blk = pl.program_id(0)
        base = 0
    x0a_max = wt - 256
    R = _TT - 2                    # max sample offset
    half = (w - 1) / 2.0

    # ---- per-feature setup: load + roll all four patches to an EXACT
    # integer corner (template: floor of the window top-left; current:
    # floor minus the travel margin), record fractional offsets ----
    def setup(k, _):
        f = (base + blk * bf + k) * 6
        tx = flt_ref[f]            # template window top-left (x, y), float
        ty = flt_ref[f + 1]
        cx = flt_ref[f + 2]        # current window top-left at the guess
        cy = flt_ref[f + 3]
        live = flt_ref[f + 4]

        @pl.when(live > 0)
        def _():
            def load(src, dst, y0, x0):
                """Place src[y0:y0+py, x0:x0+px] at dst[k], rows/cols exact
                (y0, x0 pre-clamped ints)."""
                y0a = pl.multiple_of((y0 // 8) * 8, 8)
                x0a = pl.multiple_of(
                    jnp.minimum((x0 // 128) * 128, x0a_max), 128
                )
                span = src[0, pl.ds(y0a, py), pl.ds(x0a, 256)]
                span = pltpu.roll(span, -(y0 - y0a), 0)
                span = pltpu.roll(span, -(x0 - x0a), 1)
                dst[k] = span[:, :px]

            t_iy = jnp.clip(jnp.floor(ty).astype(jnp.int32), 0, ht - py)
            t_ix = jnp.clip(jnp.floor(tx).astype(jnp.int32), 0, iw - px)
            c_iy = jnp.clip(
                jnp.floor(cy).astype(jnp.int32) - _MARGIN, 0, ht - py
            )
            c_ix = jnp.clip(
                jnp.floor(cx).astype(jnp.int32) - _MARGIN, 0, iw - px
            )
            load(prev_ref, t_scr, t_iy, t_ix)
            load(gx_ref, gx_scr, t_iy, t_ix)
            load(gy_ref, gy_scr, t_iy, t_ix)
            load(curr_ref, c_scr, c_iy, c_ix)

        @pl.when(live <= 0)
        def _():
            # dead slots still flow through the batched math below; zero
            # patches keep their G singular and every flag false
            t_scr[k] = jnp.zeros((py, px), t_scr.dtype)
            gx_scr[k] = jnp.zeros((py, px), t_scr.dtype)
            gy_scr[k] = jnp.zeros((py, px), t_scr.dtype)
            c_scr[k] = jnp.zeros((py, px), t_scr.dtype)
        return 0

    jax.lax.fori_loop(0, bf, setup, 0)

    # ---- batched fractional offsets: the same per-feature floats come in
    # a second time as a VMEM block (Mosaic cannot vector-gather from the
    # SMEM prefetch array; the scalar reads in the setup loop can't read
    # vectors) ----
    def _c(a, i):
        # column read as slice+reshape: integer indexing on a value
        # lowers to a gather, which Mosaic rejects
        return a[:, i:i + 1].reshape(a.shape[0])

    v = fltv_ref[0]                 # (bf, 8)
    tx = _c(v, 0)
    ty = _c(v, 1)
    cx = _c(v, 2)
    cy = _c(v, 3)
    live = _c(v, 4) > 0

    t_iy = jnp.clip(jnp.floor(ty).astype(jnp.int32), 0, ht - py)
    t_ix = jnp.clip(jnp.floor(tx).astype(jnp.int32), 0, iw - px)
    c_iy = jnp.clip(jnp.floor(cy).astype(jnp.int32) - _MARGIN, 0, ht - py)
    c_ix = jnp.clip(jnp.floor(cx).astype(jnp.int32) - _MARGIN, 0, iw - px)
    t_off = jnp.stack([tx - t_ix, ty - t_iy], axis=-1)      # (bf, 2)
    o0 = jnp.stack([cx - c_ix, cy - c_iy], axis=-1)         # (bf, 2)

    # template tap budget: wide enough for border-clamped offsets (the
    # sampled window must stay inside the patch: offset <= min(py,px)-w-1)
    tt_t = min(py, px) - w
    assert tt_t >= 2, (py, px, w)

    # template usable iff its offset stayed within the tap budget after the
    # clamp (the XLA path's t_in check with the exact-corner layout)
    t_in = (
        (_c(t_off, 0) >= 0.0) & (_c(t_off, 0) <= tt_t - 2.0)
        & (_c(t_off, 1) >= 0.0) & (_c(t_off, 1) <= tt_t - 2.0)
    )
    t_off = jnp.clip(t_off, 0.0, tt_t - 2.0)

    def sample(scr, o, tt):
        """Separable hat-tap bilinear sample: (bf, w, w) windows of scr
        at per-feature offsets o (bf, 2) in [0, tt-2]. hat(t) puts the
        two bilinear weights on the straddling taps; every slice is
        static, so the whole block stays batched VPU work."""
        taps = jnp.arange(tt, dtype=jnp.float32)
        hx = jnp.maximum(0.0, 1.0 - jnp.abs(o[:, 0:1] - taps))  # (bf, tt)
        hy = jnp.maximum(0.0, 1.0 - jnp.abs(o[:, 1:2] - taps))
        rows = tt - 1 + w
        A = hx[:, 0:1, None] * scr[:, :rows, 0:w]
        for i in range(1, tt):
            A = A + hx[:, i:i + 1, None] * scr[:, :rows, i:i + w]
        Iw = hy[:, 0:1, None] * A[:, 0:w]
        for j in range(1, tt):
            Iw = Iw + hy[:, j:j + 1, None] * A[:, j:j + w]
        return Iw

    # materialize the scratch blocks once; sample() then slices VALUES
    # (static slices of a vector value lower cleanly; multi-dim strided
    # reads of a ref hit Mosaic's gather path and fail)
    t_val = t_scr[...]
    gx_val = gx_scr[...]
    gy_val = gy_scr[...]
    c_val = c_scr[...]

    # template + gradients at the fixed fractional offset (2 hot taps)
    T = sample(t_val, t_off, tt_t)
    Tx = sample(gx_val, t_off, tt_t)
    Ty = sample(gy_val, t_off, tt_t)

    a11 = jnp.sum(Tx * Tx, axis=(1, 2))
    a12 = jnp.sum(Tx * Ty, axis=(1, 2))
    a22 = jnp.sum(Ty * Ty, axis=(1, 2))
    win_area = float(w * w)
    tr_half = (a11 + a22) * 0.5
    disc = jnp.sqrt(
        jnp.maximum(tr_half * tr_half - (a11 * a22 - a12 * a12), 0.0)
    )
    min_eig = (tr_half - disc) / win_area
    det = a11 * a22 - a12 * a12
    inv_det = 1.0 / jnp.where(det > 1e-12, det, 1.0)
    i11 = a22 * inv_det
    i12 = -a12 * inv_det
    i22 = a11 * inv_det

    eps2 = eps * eps
    Rf = float(R)

    def lk_iter(_, carry):
        o, conv = carry
        ox, oy = _c(o, 0), _c(o, 1)
        in_patch = (
            (ox >= 0.0) & (ox <= Rf) & (oy >= 0.0) & (oy <= Rf)
        )
        o_cl = jnp.clip(o, 0.0, Rf)
        Iw = sample(c_val, o_cl, _TT)
        diff = Iw - T
        b1 = jnp.sum(diff * Tx, axis=(1, 2))
        b2 = jnp.sum(diff * Ty, axis=(1, 2))
        du = -(i11 * b1 + i12 * b2)
        dv = -(i12 * b1 + i22 * b2)
        step = jnp.stack([du, dv], axis=-1)
        active = (~conv) & in_patch
        o = jnp.where(active[:, None], o + step, o)
        conv = conv | (du * du + dv * dv < eps2) | (~in_patch)
        return o, conv

    o_fin, _ = jax.lax.fori_loop(
        0, max_iters, lk_iter, (o0, jnp.zeros((bf,), bool))
    )

    solvable = (min_eig > min_eig_threshold) & (det > 1e-12) & t_in & live
    ofx, ofy = _c(o_fin, 0), _c(o_fin, 1)
    in_fin = (
        (ofx >= -1.0) & (ofx <= Rf + 1.0)
        & (ofy >= -1.0) & (ofy <= Rf + 1.0)
    )
    out_ref[0] = jnp.stack(
        [
            ofx - _c(o0, 0),                   # dx relative to the guess
            ofy - _c(o0, 1),                   # dy
            min_eig,
            solvable.astype(jnp.float32),
            in_fin.astype(jnp.float32),
            jnp.zeros((bf,), jnp.float32),
            jnp.zeros((bf,), jnp.float32),
            jnp.zeros((bf,), jnp.float32),
        ],
        axis=-1,
    )


def _pack_floats(t_tl, c_tl, valid, n_pad):
    """Returns (smem_flat, vmem_blk8): the same per-feature floats for
    the scalar-prefetch setup loop and as a (…, N, 8) VMEM operand for
    the batched phase."""
    z = jnp.zeros_like(t_tl[..., 0])
    flt = jnp.stack(
        [
            t_tl[..., 0], t_tl[..., 1], c_tl[..., 0], c_tl[..., 1],
            valid.astype(jnp.float32), z,
        ],
        axis=-1,
    )
    fltv = jnp.concatenate([flt, z[..., None], z[..., None]], axis=-1)
    if n_pad:
        pad = [(0, 0)] * (flt.ndim - 2) + [(0, n_pad), (0, 0)]
        flt = jnp.pad(flt, pad)
        fltv = jnp.pad(fltv, pad)
    return flt.reshape(-1), fltv


def _call(imgs, flt, fltv, *, n_total, py, wt, iw, ht, w, max_iters, eps,
          min_eig_threshold, batched, S=1, interpret=False):
    H, W = imgs[0].shape[-2:]
    kern = functools.partial(
        _kernel, bf=_BF, py=py, px=_PX, wt=wt, iw=iw, ht=ht, w=w,
        n_total=n_total,
        batched=batched, max_iters=max_iters, eps=eps,
        min_eig_threshold=min_eig_threshold,
    )
    scratch = [pltpu.VMEM((_BF, py, _PX), jnp.float32)] * 4
    if batched:
        grid = (S, n_total // _BF)
        img_spec = pl.BlockSpec(
            (1, H, W), lambda s, f, *_: (s, 0, 0), memory_space=pltpu.VMEM
        )
        blk8_spec = pl.BlockSpec(
            (1, _BF, 8), lambda s, f, *_: (s, f, 0), memory_space=pltpu.VMEM
        )
        out_shape = jax.ShapeDtypeStruct((S, n_total, 8), jnp.float32)
    else:
        grid = (n_total // _BF,)
        img_spec = pl.BlockSpec(
            (1, H, W), lambda f, *_: (0, 0, 0), memory_space=pltpu.VMEM
        )
        blk8_spec = pl.BlockSpec(
            (1, _BF, 8), lambda f, *_: (0, f, 0), memory_space=pltpu.VMEM
        )
        out_shape = jax.ShapeDtypeStruct((1, n_total, 8), jnp.float32)
        imgs = [i[None] if i.ndim == 2 else i for i in imgs]
        fltv = fltv[None]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[img_spec] * 4 + [blk8_spec],
        out_specs=blk8_spec,
        scratch_shapes=scratch,
    )

    def wrapped(flt_ref, prev, gx, gy, curr, fltv_r, out,
                t_s, gx_s, gy_s, c_s):
        kern(flt_ref, prev, gx, gy, curr, fltv_r, out,
             t_scr=t_s, gx_scr=gx_s, gy_scr=gy_s, c_scr=c_s)

    return pl.pallas_call(
        wrapped,
        grid_spec=grid_spec,
        out_shape=out_shape,
        compiler_params=_COMPILER_PARAMS,
        interpret=interpret,
    )(flt, *imgs, fltv)


@functools.lru_cache(maxsize=None)
def _make_track(py: int, w: int, max_iters: int, eps: float,
                min_eig_threshold: float, interpret: bool = False):
    @custom_batching.custom_vmap
    def track_level(prev, gx, gy, curr, t_tl, c_tl, valid):
        H, W = prev.shape
        N = valid.shape[0]
        n_pad = (-N) % _BF
        wt = ((W + 127) // 128) * 128
        flt, fltv = _pack_floats(t_tl, c_tl, valid, n_pad)
        out = _call(
            [prev, gx, gy, curr], flt, fltv,
            n_total=N + n_pad, py=py, wt=wt, iw=W, ht=H, w=w,
            max_iters=max_iters, eps=eps,
            min_eig_threshold=min_eig_threshold,
            batched=False, interpret=interpret,
        )
        return out[0, :N]

    @track_level.def_vmap
    def _batched(axis_size, in_batched, prev, gx, gy, curr, t_tl, c_tl,
                 valid):
        def bc(x, b):
            return x if b else jnp.broadcast_to(x, (axis_size,) + x.shape)

        prev, gx, gy, curr, t_tl, c_tl, valid = (
            bc(a, b) for a, b in zip(
                (prev, gx, gy, curr, t_tl, c_tl, valid), in_batched
            )
        )
        S, H, W = prev.shape
        N = valid.shape[1]
        n_pad = (-N) % _BF
        wt = ((W + 127) // 128) * 128
        flt, fltv = _pack_floats(t_tl, c_tl, valid, n_pad)
        out = _call(
            [prev, gx, gy, curr], flt, fltv,
            n_total=N + n_pad, py=py, wt=wt, iw=W, ht=H, w=w,
            max_iters=max_iters, eps=eps,
            min_eig_threshold=min_eig_threshold,
            batched=True, S=S, interpret=interpret,
        )
        return out[:, :N], True

    return track_level


def lk_track_level(
    prev: jnp.ndarray,
    gx: jnp.ndarray,
    gy: jnp.ndarray,
    curr: jnp.ndarray,
    pos: jnp.ndarray,
    guess: jnp.ndarray,
    valid: jnp.ndarray,
    *,
    window: int,
    py: int,
    max_iters: int,
    eps: float,
    min_eig_threshold: float,
    interpret: bool = False,
):
    """Run one fused LK level. Returns (d, min_eig, solvable, in_patch):
    d (N,2) is the updated flow (guess + iterations), flags are (N,) bools.

    prev/gx/gy/curr: PADDED level images (see ops/klt.py pyramid padding).
    pos: (N,2) feature positions in padded level coords; guess: (N,2) flow-in.
    Requires W > 128 (two lane tiles) and H >= py. interpret=True runs the
    kernel in Pallas interpret mode on lane-tile-padded images (CI parity —
    same contract as klt_pallas.extract_klt_patches)."""
    W = prev.shape[-1]
    assert ((W + 127) // 128) * 128 >= 256, f"image too narrow: W={W}"
    if interpret:
        assert W % 128 == 0, (
            f"interpret mode requires lane-tile-padded images (W={W})"
        )
    half = (window - 1) / 2.0
    t_tl = pos - half
    c_tl = pos + guess - half
    out = _make_track(
        py, window, max_iters, eps, min_eig_threshold, interpret
    )(prev, gx, gy, curr, t_tl, c_tl, valid)
    d = guess + out[..., 0:2]
    min_eig = out[..., 2]
    solvable = out[..., 3] > 0.5
    in_patch = out[..., 4] > 0.5
    return d, min_eig, solvable, in_patch
