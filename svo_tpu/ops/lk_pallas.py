"""Fused Pallas TPU kernel: one pyramidal-LK LEVEL per launch (2-D layout).

The round-2 design (ops/klt_pallas.py) used Pallas only for patch
EXTRACTION: each level materialized four (N, py, px) patch tensors to HBM
(~25 MB per call at 8 streams) and the LK math ran as ~150 small XLA ops per
step (one-hot blend einsums + iteration bookkeeping), whose per-op dispatch
overhead dominated the profile (docs/perf_notes.md: ~2,900 device ops/step,
~10-13 ms dispatch floor). This kernel fuses the whole level:

    load + roll patches into VMEM scratch      (no HBM patch writes)
    sample template T and gradients Tx, Ty     (separable hat-tap blend)
    normal matrix G, min-eigenvalue gate       (batched over the block)
    max_iters LK updates                       (in-VMEM, batched)
    output (N, 8) floats                       (d, flags — KBs, not MBs)

2-D LAYOUT (round-4 reformulation): the round-3 kernel held patches as
(BF, py, px) 3-D scratch and sampled with static 3-D value slices — which
SIGABRT this environment's Mosaic compiler (docs/mosaic_limits.md #1). Here
features fold into SUBLANE ROWS: scratch is (BF*py + 64, px) 2-D, feature k
owns rows [k*py, (k+1)*py). Everything the 3-D kernel expressed with 3-D
slices becomes:

- x taps: 2-D lane slices  scr[:, i:i+w]                       (probe T7 ok)
- y taps: GLOBAL row-shifted 2-D slices  A[j : j+BF*py]  — the +64 scratch
  row pad makes every shift in-bounds; a shift never crosses into the next
  feature's band for valid output rows because py >= w + taps - 2
- per-feature weights: per-ROW weight columns (L, 1) built by expanding
  (BF, 1) feature values through a selector matmul  E @ v, with
  E[r, f] = [f*py <= r < (f+1)*py]  — a pure iota comparison, no gather
- per-feature reductions: lane row-sum then a selector matmul  S @ rowsum,
  with S[f, r] = [0 <= r - f*py < w]  (also masks the garbage rows yy >= w)

The per-feature fractional+integer offset lives entirely in the hat weights
hat(t) = max(0, 1 - |t|) — exactly bilinear interpolation with static
slices. Iteration travel beyond (2*margin) px from the initial guess marks
the feature lost (the XLA path allows ~13 px before its patch clamp binds;
the default margins lose only tracks the fb-check/RANSAC would reject
anyway). Margins are PER-AXIS so the stereo matcher's wide negative-x
disparity budget (margin_x=16, KltParams.margin_x) gets real kernel support
instead of silently shrinking (ADVICE r03).

Alignment contract (same as klt_pallas.py): row loads from sublane-aligned
corners, 256-lane spans from lane-aligned corners, both corrected by
pltpu.roll with dynamic shifts; scratch bands start at k*py with py a
multiple of 8.

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

_BF = 16         # features per grid step: scratch + lane-padded row-fold
#                  intermediates scale with BF*py; 16 keeps the kernel's
#                  true VMEM need inside XLA's default 16 MB scoped budget
#                  so the call coexists with real pipeline programs (32
#                  OOM'd once images stopped being VMEM windows)
_PX = 64         # patch cols held in scratch (loads are 256-lane spans)
_PAD_ROWS = 64   # scratch row pad so every y-tap shift slices in-bounds
_TT_T = 4        # template taps: exact-corner offsets are < 1 except at
#                  image-border clamps, where the feature dies anyway

# NO explicit vmem_limit_bytes: XLA charges the DECLARED limit itself as
# the custom call's scoped allocation (measured: every compile failure's
# "scoped allocation size" was exactly limit + coexisting stack bytes, at
# 32, 56 and 96 MB declared), so an oversized limit OOMs programs that
# would fit. With images in HBM (round-5 DMA redesign) the kernel's true
# VMEM need is ~1.8 MB (4 scratch bands + 2x4 staging spans) and the
# default budget suffices.
_COMPILER_PARAMS = None


def _kernel(flt_ref, prev_ref, gx_ref, gy_ref, curr_ref, fltv_ref,
            out_ref, *,
            bf, py, px, wt, iw, ht, w, mx, my, n_total, batched, max_iters,
            eps, min_eig_threshold, t_scr, gx_scr, gy_scr, c_scr,
            stage, sems):
    if batched:
        s = pl.program_id(0)
        blk = pl.program_id(1)
        base = s * n_total
        sidx = s
    else:
        blk = pl.program_id(0)
        base = 0
        sidx = 0
    x0a_max = wt - 256
    ttx = 2 * mx + 2               # x iteration taps; travel Rx = 2*mx
    tty = 2 * my + 2               # y iteration taps; travel Ry = 2*my
    Rx, Ry = float(2 * mx), float(2 * my)
    L = bf * py + _PAD_ROWS        # scratch rows
    Lc = bf * py                   # y-shifted slice length
    f32 = jnp.float32
    srcs = (prev_ref, gx_ref, gy_ref, curr_ref)
    dsts = (t_scr, gx_scr, gy_scr, c_scr)

    # ---- per-feature setup, DMA double-buffered (round-5 redesign): the
    # images live in HBM (memory_space=ANY) — the previous design's
    # full-image VMEM windows cost ~44 MB of scoped vmem at S=8 and made
    # XLA re-stream 4 x 2.2 MB per grid step, which is where the "fused
    # kernel 3x slower than the XLA path" of round 4 actually went (probe:
    # the kernel body itself runs in ~0.05 ms). Each feature's four
    # (py, 256) spans are DMA'd into a 2-slot staging scratch; feature k+1's
    # DMAs are issued BEFORE consuming feature k, so the copies overlap the
    # roll/store work and the steady-state setup cost is max(DMA, VPU). ----
    def corners(k):
        f = (base + blk * bf + k) * 6
        tx = flt_ref[f]            # template window top-left (x, y), float
        ty = flt_ref[f + 1]
        cx = flt_ref[f + 2]        # current window top-left at the guess
        cy = flt_ref[f + 3]
        live = flt_ref[f + 4]
        t_iy = jnp.clip(jnp.floor(ty).astype(jnp.int32), 0, ht - py)
        t_ix = jnp.clip(jnp.floor(tx).astype(jnp.int32), 0, iw - px)
        c_iy = jnp.clip(jnp.floor(cy).astype(jnp.int32) - my, 0, ht - py)
        c_ix = jnp.clip(jnp.floor(cx).astype(jnp.int32) - mx, 0, iw - px)
        ys = (t_iy, t_iy, t_iy, c_iy)
        xs = (t_ix, t_ix, t_ix, c_ix)
        return ys, xs, live

    def aligned(y0, x0):
        y0a = pl.multiple_of((y0 // 8) * 8, 8)
        x0a = pl.multiple_of(jnp.minimum((x0 // 128) * 128, x0a_max), 128)
        return y0a, x0a

    def issue(k, slot):
        ys, xs, _ = corners(k)
        for i in range(4):
            y0a, x0a = aligned(ys[i], xs[i])
            pltpu.make_async_copy(
                srcs[i].at[sidx, pl.ds(y0a, py), pl.ds(x0a, 256)],
                stage.at[slot, i],
                sems.at[slot, i],
            ).start()

    def consume(k, slot):
        ys, xs, live = corners(k)
        for i in range(4):
            y0a, x0a = aligned(ys[i], xs[i])
            pltpu.make_async_copy(
                srcs[i].at[sidx, pl.ds(y0a, py), pl.ds(x0a, 256)],
                stage.at[slot, i],
                sems.at[slot, i],
            ).wait()

        @pl.when(live > 0)
        def _():
            for i in range(4):
                y0a, x0a = aligned(ys[i], xs[i])
                span = stage[slot, i]
                # canonicalize roll shifts to non-negative: a negative
                # DYNAMIC shift on the sublane dim compiles but silently
                # corrupts the data on this Mosaic (docs/mosaic_limits.md
                # #5; the lane dim tolerated it in klt_pallas, the sublane
                # dim does not)
                span = pltpu.roll(span, (py - (ys[i] - y0a)) % py, 0)
                span = pltpu.roll(span, (256 - (xs[i] - x0a)) % 256, 1)
                dsts[i][pl.ds(k * py, py), :] = span[:, :px]

        @pl.when(live <= 0)
        def _():
            # dead slots still flow through the batched math below; zero
            # patches keep their G singular and every flag false
            z = jnp.zeros((py, px), f32)
            for i in range(4):
                dsts[i][pl.ds(k * py, py), :] = z

    issue(0, 0)

    def setup(k, _):
        slot = jax.lax.rem(k, 2)

        @pl.when(k + 1 < bf)
        def _():
            issue(k + 1, jax.lax.rem(k + 1, 2))

        consume(k, slot)
        return 0

    jax.lax.fori_loop(0, bf, setup, 0)
    # zero the row pad once: pad rows feed (masked) y-tap sums of invalid
    # output rows and must be finite
    zpad = jnp.zeros((_PAD_ROWS, px), f32)
    t_scr[pl.ds(bf * py, _PAD_ROWS), :] = zpad
    gx_scr[pl.ds(bf * py, _PAD_ROWS), :] = zpad
    gy_scr[pl.ds(bf * py, _PAD_ROWS), :] = zpad
    c_scr[pl.ds(bf * py, _PAD_ROWS), :] = zpad

    # ---- selector matrices (pure iota comparisons; no gather) ----
    # E (L, bf): expand per-feature columns to per-row columns
    rE = jax.lax.broadcasted_iota(jnp.int32, (L, bf), 0)
    fE = jax.lax.broadcasted_iota(jnp.int32, (L, bf), 1)
    E = ((rE >= fE * py) & (rE < (fE + 1) * py)).astype(f32)
    # S (bf, Lc): reduce valid window rows (yy < w) back to features
    fS = jax.lax.broadcasted_iota(jnp.int32, (bf, Lc), 0)
    rS = jax.lax.broadcasted_iota(jnp.int32, (bf, Lc), 1)
    dS = rS - fS * py
    S = ((dS >= 0) & (dS < w)).astype(f32)

    def expand(v_bf1):
        """(bf, 1) -> (L, 1): replicate each feature's value over its rows."""
        return jax.lax.dot_general(
            E, v_bf1, (((1,), (0,)), ((), ())), preferred_element_type=f32
        )

    def reduce_feat(x):
        """(Lc, w) -> (bf, 1): sum each feature's w x w window."""
        rs = jnp.sum(x, axis=1, keepdims=True)       # (Lc, 1)
        return jax.lax.dot_general(
            S, rs, (((1,), (0,)), ((), ())), preferred_element_type=f32
        )

    # ---- batched fractional offsets: the same per-feature floats come in
    # a second time as a VMEM block (Mosaic cannot vector-gather from the
    # SMEM prefetch array; the scalar reads in the setup loop can't read
    # vectors) ----
    v = fltv_ref[0]                 # (bf, 8)
    vcols = jax.lax.broadcasted_iota(jnp.int32, v.shape, 1)

    def _col(i):
        # column extraction as a masked lane-reduction: a plain v[:, i:i+1]
        # slice keeps a lane-OFFSET layout, which the scf.for legalization
        # of the LK iteration loop cannot reconcile between entry and yield
        # (carried values must be offset-0); the reduction canonicalizes
        return jnp.sum(
            jnp.where(vcols == i, v, 0.0), axis=1, keepdims=True
        )

    tx = _col(0)
    ty = _col(1)
    cx = _col(2)
    cy = _col(3)
    live = _col(4) > 0

    t_iy = jnp.clip(jnp.floor(ty).astype(jnp.int32), 0, ht - py)
    t_ix = jnp.clip(jnp.floor(tx).astype(jnp.int32), 0, iw - px)
    c_iy = jnp.clip(jnp.floor(cy).astype(jnp.int32) - my, 0, ht - py)
    c_ix = jnp.clip(jnp.floor(cx).astype(jnp.int32) - mx, 0, iw - px)
    t_ox = tx - t_ix.astype(f32)    # (bf, 1)
    t_oy = ty - t_iy.astype(f32)
    o0x = cx - c_ix.astype(f32)
    o0y = cy - c_iy.astype(f32)

    # template usable iff its offset stayed within the tap budget after the
    # clamp (clamping only happens at image borders, where the XLA path's
    # t_in check likewise fires)
    t_in = (
        (t_ox >= 0.0) & (t_ox <= _TT_T - 2.0)
        & (t_oy >= 0.0) & (t_oy <= _TT_T - 2.0)
    )
    t_ox = jnp.clip(t_ox, 0.0, _TT_T - 2.0)
    t_oy = jnp.clip(t_oy, 0.0, _TT_T - 2.0)

    def sample(scr, ox_rows, oy_rows, tx_taps, ty_taps):
        """Separable hat-tap bilinear sample of every feature's w x w window
        at per-feature offsets, all rows batched. ox_rows (L,1) / oy_rows
        (Lc,1) are the per-ROW offset columns; every slice is 2-D."""
        A = jnp.zeros((L, w), f32)
        for i in range(tx_taps):
            hx = jnp.maximum(0.0, 1.0 - jnp.abs(ox_rows - i))
            A = A + hx * scr[:, i:i + w]
        Iw = jnp.zeros((Lc, w), f32)
        for j in range(ty_taps):
            hy = jnp.maximum(0.0, 1.0 - jnp.abs(oy_rows - j))
            Iw = Iw + hy * A[j:j + Lc]
        return Iw

    # materialize the scratch blocks once as 2-D values
    t_val = t_scr[...]
    gx_val = gx_scr[...]
    gy_val = gy_scr[...]
    c_val = c_scr[...]

    # template + gradients at the fixed fractional offset (2 hot taps)
    t_ox_rows = expand(t_ox)
    t_oy_rows = expand(t_oy)[:Lc]
    T = sample(t_val, t_ox_rows, t_oy_rows, _TT_T, _TT_T)
    Tx = sample(gx_val, t_ox_rows, t_oy_rows, _TT_T, _TT_T)
    Ty = sample(gy_val, t_ox_rows, t_oy_rows, _TT_T, _TT_T)

    a11 = reduce_feat(Tx * Tx)      # (bf, 1)
    a12 = reduce_feat(Tx * Ty)
    a22 = reduce_feat(Ty * Ty)
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

    # LK iteration loop as an scf.for with FULL-LANE (bf, 128) carries:
    # (bf, 1) carries mix matmul-output and elementwise layouts that the
    # loop cannot reconcile between entry and yield ('failed to legalize
    # scf.for'); broadcasting every carried value across the lane tile
    # keeps all of them in the canonical vreg layout. Inputs to expand()
    # are narrowed back to (bf, 1) with a lane slice (not loop-carried, so
    # the offset layout is harmless there).
    lanes = jnp.zeros((bf, 128), f32)

    def wide(v_bf1):
        return v_bf1 + lanes

    def lk_iter(_, carry):
        ox, oy, conv = carry        # (bf, 128) f32 each (conv: 0/1 mask)
        in_patch = (
            (ox >= 0.0) & (ox <= Rx) & (oy >= 0.0) & (oy <= Ry)
        ).astype(f32)
        ox_cl = jnp.clip(ox[:, :1], 0.0, Rx)
        oy_cl = jnp.clip(oy[:, :1], 0.0, Ry)
        Iw = sample(c_val, expand(ox_cl), expand(oy_cl)[:Lc], ttx, tty)
        diff = Iw - T
        b1 = reduce_feat(diff * Tx)
        b2 = reduce_feat(diff * Ty)
        du = wide(-(i11 * b1 + i12 * b2))
        dv = wide(-(i12 * b1 + i22 * b2))
        active = (1.0 - conv) * in_patch
        ox = ox + active * du
        oy = oy + active * dv
        small = (du * du + dv * dv < eps2).astype(f32)
        conv = jnp.minimum(conv + small + (1.0 - in_patch), 1.0)
        return ox, oy, conv

    ofx, ofy, _ = jax.lax.fori_loop(
        0, max_iters, lk_iter,
        (wide(o0x), wide(o0y), jnp.zeros((bf, 128), f32)),
    )
    ofx = ofx[:, :1]
    ofy = ofy[:, :1]

    solvable = (min_eig > min_eig_threshold) & (det > 1e-12) & t_in & live
    in_fin = (
        (ofx >= -1.0) & (ofx <= Rx + 1.0)
        & (ofy >= -1.0) & (ofy <= Ry + 1.0)
    )
    zero = jnp.zeros((bf, 1), f32)
    out_ref[0] = jnp.concatenate(
        [
            ofx - o0x,                        # dx relative to the guess
            ofy - o0y,                        # dy
            min_eig,
            solvable.astype(f32),
            in_fin.astype(f32),
            zero, zero, zero,
        ],
        axis=1,
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


def _call(imgs, flt, fltv, *, n_total, py, wt, iw, ht, w, mx, my, max_iters,
          eps, min_eig_threshold, batched, S=1, interpret=False):
    H, W = imgs[0].shape[-2:]
    kern = functools.partial(
        _kernel, bf=_BF, py=py, px=_PX, wt=wt, iw=iw, ht=ht, w=w,
        mx=mx, my=my, n_total=n_total,
        batched=batched, max_iters=max_iters, eps=eps,
        min_eig_threshold=min_eig_threshold,
    )
    scratch = [pltpu.VMEM((_BF * py + _PAD_ROWS, _PX), jnp.float32)] * 4
    # DMA staging: 2 slots x 4 images of (py, 256) spans + matching sems
    scratch += [
        pltpu.VMEM((2, 4, py, 256), jnp.float32),
        pltpu.SemaphoreType.DMA((2, 4)),
    ]
    # images stay in HBM (forced — ANY lets the compiler pick VMEM and it
    # does): the kernel DMAs per-feature spans itself — full-image VMEM
    # windows cost ~44 MB scoped vmem at S=8 and dominated the in-pipeline
    # runtime (round-4 "setup loop" misdiagnosis)
    img_spec = pl.BlockSpec(memory_space=pltpu.HBM)
    if batched:
        grid = (S, n_total // _BF)
        blk8_spec = pl.BlockSpec(
            (1, _BF, 8), lambda s, f, *_: (s, f, 0), memory_space=pltpu.VMEM
        )
        out_shape = jax.ShapeDtypeStruct((S, n_total, 8), jnp.float32)
    else:
        grid = (n_total // _BF,)
        blk8_spec = pl.BlockSpec(
            (1, _BF, 8), lambda f, *_: (0, f, 0), memory_space=pltpu.VMEM
        )
        out_shape = jax.ShapeDtypeStruct((1, n_total, 8), jnp.float32)
        imgs = [i[None] if i.ndim == 2 else i for i in imgs]
        fltv = fltv[None]
    # Plain in_specs (NOT PrefetchScalarGridSpec): the legacy prefetch grid
    # spec ignores memory_space on image specs and windows the full array
    # into VMEM regardless (measured: 50.6 MB scoped vmem at S=8 with HBM
    # requested). The per-feature scalars ride an SMEM full-array spec
    # instead — scalar reads in the setup loop work the same.
    smem_spec = pl.BlockSpec(memory_space=pltpu.SMEM)

    def wrapped(flt_ref, prev, gx, gy, curr, fltv_r, out,
                t_s, gx_s, gy_s, c_s, stage, sems):
        kern(flt_ref, prev, gx, gy, curr, fltv_r, out,
             t_scr=t_s, gx_scr=gx_s, gy_scr=gy_s, c_scr=c_s,
             stage=stage, sems=sems)

    return pl.pallas_call(
        wrapped,
        grid=grid,
        in_specs=[smem_spec] + [img_spec] * 4 + [blk8_spec],
        out_specs=blk8_spec,
        out_shape=out_shape,
        scratch_shapes=scratch,
        compiler_params=_COMPILER_PARAMS,
        interpret=interpret,
    )(flt, *imgs, fltv)


@functools.lru_cache(maxsize=None)
def _make_track(py: int, w: int, mx: int, my: int, max_iters: int,
                eps: float, min_eig_threshold: float,
                interpret: bool = False):
    @custom_batching.custom_vmap
    def track_level(prev, gx, gy, curr, t_tl, c_tl, valid):
        H, W = prev.shape
        N = valid.shape[0]
        n_pad = (-N) % _BF
        wt = ((W + 127) // 128) * 128
        # pad widths to the lane tile: every (py, 256) span DMA the kernel
        # issues is then in-bounds of the logical array
        imgs = [
            jnp.pad(a, ((0, 0), (0, wt - W))) if wt != W else a
            for a in (prev, gx, gy, curr)
        ]
        flt, fltv = _pack_floats(t_tl, c_tl, valid, n_pad)
        out = _call(
            imgs, flt, fltv,
            n_total=N + n_pad, py=py, wt=wt, iw=W, ht=H, w=w, mx=mx, my=my,
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
        imgs = [
            jnp.pad(a, ((0, 0), (0, 0), (0, wt - W))) if wt != W else a
            for a in (prev, gx, gy, curr)
        ]
        flt, fltv = _pack_floats(t_tl, c_tl, valid, n_pad)
        out = _call(
            imgs, flt, fltv,
            n_total=N + n_pad, py=py, wt=wt, iw=W, ht=H, w=w, mx=mx, my=my,
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
    margin_x: int = 6,
    margin_y: int = 6,
    interpret: bool = False,
):
    """Run one fused LK level. Returns (d, min_eig, solvable, in_patch):
    d (N,2) is the updated flow (guess + iterations), flags are (N,) bools.

    prev/gx/gy/curr: PADDED level images (see ops/klt.py pyramid padding).
    pos: (N,2) feature positions in padded level coords; guess: (N,2) flow-in.
    margin_x/margin_y: per-axis iteration travel budget is 2*margin px
    (stereo matching uses margin_x=16 for disparity; temporal uses 6/6).
    Requires W > 128 (two lane tiles), H >= py, py % 8 == 0, and
    py >= window + 2*margin_y (y-taps must not cross feature bands).
    NOTE positions of status=False features are unspecified (the kernel
    freezes them at the guess; the XLA path keeps iterating) — consumers
    must mask by status. interpret=True runs the kernel in Pallas interpret
    mode on lane-tile-padded images (CI parity — same contract as
    klt_pallas.extract_klt_patches)."""
    W = prev.shape[-1]
    assert ((W + 127) // 128) * 128 >= 256, f"image too narrow: W={W}"
    assert py % 8 == 0, f"py={py} must be a sublane multiple"
    assert py >= window + 2 * margin_y, (py, window, margin_y)
    assert _PX >= window + 2 * margin_x + 1, (window, margin_x)
    assert 2 * max(margin_x, margin_y) + 2 <= _PAD_ROWS + 1
    # (interpret mode no longer needs pre-padded images: _make_track pads
    # every input to the lane tile itself since the HBM-DMA redesign)
    half = (window - 1) / 2.0
    t_tl = pos - half
    c_tl = pos + guess - half
    out = _make_track(
        py, window, margin_x, margin_y, max_iters, eps, min_eig_threshold,
        interpret,
    )(prev, gx, gy, curr, t_tl, c_tl, valid)
    d = guess + out[..., 0:2]
    min_eig = out[..., 2]
    solvable = out[..., 3] > 0.5
    in_patch = out[..., 4] > 0.5
    return d, min_eig, solvable, in_patch
