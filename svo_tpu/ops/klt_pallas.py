"""Pallas TPU kernel: per-feature patch extraction for the KLT tracker.

Round-1 profiling showed XLA lowering the tracker's vmapped dynamic_slice
patch gathers to a sequential while-loop over features (gather expander) —
~70% of the whole frame step (~1.1M dynamic-slice ops per 12-frame chunk).
This kernel replaces it: the level image is VMEM-resident (one block per
grid step, revisited across the feature dimension), each feature's patch
rows are vector-loaded from a sublane-aligned corner and lane-rotated
(pltpu.roll) to the exact x position.

Alignment contract (Mosaic requires statically provable alignment for VMEM
vector loads):
- row starts must be multiples of 8 — the caller pre-aligns y corners DOWN
  to the sublane tile and absorbs the shift in its fractional offsets;
- lane starts must be multiples of 128 — the kernel reads a 256-lane span
  from the aligned corner (clamped so it stays inside the image's physical
  lane tiles) and rolls by the remainder, so x corners are EXACT.

Invalid features are skipped (their patches are zeroed), saving the load
work for the typically ~40% dead slots of the fixed feature table.

Batching: jax.vmap's default pallas_call batching rule wraps the kernel in
a sequential while-loop over the batch (measured ~1.5 ms/step of pure loop
overhead at 8 streams), so extract_klt_patches is a custom_vmap whose
batching rule dispatches a NATIVELY batched kernel — one launch, grid
(S, N/BF), the stream axis as the outer grid dimension.

Reference anchor: this is the data-movement half of cv::calcOpticalFlowPyrLK
(reference src/tracking.cpp:98-105, 157-164); the math half lives in
ops/klt.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import custom_batching
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BF = 32  # features per grid step

_COMPILER_PARAMS = pltpu.CompilerParams(
    # actual demand: 4 level images double-buffered (~20 MB at level 0)
    # + 4 (BF,py,px) output blocks (~6 MB); a loose limit risks colliding
    # with XLA-pinned VMEM buffers inside large fused programs
    vmem_limit_bytes=48 * 1024 * 1024
)


def _kernel(corner_ref, prev_ref, gx_ref, gy_ref, curr_ref,
            t_out, gx_out, gy_out, c_out, *, bf, py, px, wt, n_total,
            batched):
    if batched:
        s = pl.program_id(0)
        blk = pl.program_id(1)
        base = s * n_total
    else:
        blk = pl.program_id(0)
        base = 0
    x0a_max = wt - 256

    def body(k, _):
        f = (base + blk * bf + k) * 5
        ty = corner_ref[f]
        tx = corner_ref[f + 1]
        cy = corner_ref[f + 2]
        cx = corner_ref[f + 3]
        live = corner_ref[f + 4]

        @pl.when(live > 0)
        def _():
            for y0, x0, src, dst in (
                (ty, tx, prev_ref, t_out),
                (ty, tx, gx_ref, gx_out),
                (ty, tx, gy_ref, gy_out),
                (cy, cx, curr_ref, c_out),
            ):
                y0a = pl.multiple_of((y0 // 8) * 8, 8)
                x0a = pl.multiple_of(
                    jnp.minimum((x0 // 128) * 128, x0a_max), 128
                )
                span = src[0, pl.ds(y0a, py), pl.ds(x0a, 256)]
                rolled = pltpu.roll(span, -(x0 - x0a), 1)
                dst[0, k] = rolled[:, :px]

        @pl.when(live <= 0)
        def _():
            for dst in (t_out, gx_out, gy_out, c_out):
                dst[0, k] = jnp.zeros((py, px), dst.dtype)

        return 0

    jax.lax.fori_loop(0, bf, body, 0)


def _pack_corners(ty0, tx0, cy0, cx0, valid, n_pad):
    corners = jnp.stack(
        [ty0, tx0, cy0, cx0, valid.astype(jnp.int32)], axis=-1
    )
    if n_pad:
        pad = [(0, 0)] * (corners.ndim - 2) + [(0, n_pad), (0, 0)]
        corners = jnp.pad(corners, pad)
    return corners.reshape(-1)


def _call(imgs, corners, *, n_total, py, px, wt, batched, S=1,
          interpret=False):
    H, W = imgs[0].shape[-2:]
    if batched:
        grid = (S, n_total // _BF)
        img_spec = pl.BlockSpec(
            (1, H, W), lambda s, f, *_: (s, 0, 0), memory_space=pltpu.VMEM
        )
        out_spec = pl.BlockSpec(
            (1, _BF, py, px), lambda s, f, *_: (s, f, 0, 0),
            memory_space=pltpu.VMEM,
        )
        out_shape = jax.ShapeDtypeStruct((S, n_total, py, px), imgs[0].dtype)
    else:
        grid = (n_total // _BF,)
        img_spec = pl.BlockSpec(
            (1, H, W), lambda f, *_: (0, 0, 0), memory_space=pltpu.VMEM
        )
        out_spec = pl.BlockSpec(
            (1, _BF, py, px), lambda f, *_: (0, f, 0, 0),
            memory_space=pltpu.VMEM,
        )
        out_shape = jax.ShapeDtypeStruct((1, n_total, py, px), imgs[0].dtype)
        imgs = [i[None] if i.ndim == 2 else i for i in imgs]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[img_spec] * 4,
        out_specs=[out_spec] * 4,
    )
    return pl.pallas_call(
        functools.partial(
            _kernel, bf=_BF, py=py, px=px, wt=wt, n_total=n_total,
            batched=batched,
        ),
        grid_spec=grid_spec,
        out_shape=[out_shape] * 4,
        compiler_params=_COMPILER_PARAMS,
        interpret=interpret,
    )(corners, *imgs)


@functools.lru_cache(maxsize=None)
def _make_extract(py: int, px: int, interpret: bool = False):
    @custom_batching.custom_vmap
    def extract(prev, gx, gy, curr, ty0, tx0, cy0, cx0, valid):
        H, W = prev.shape
        N = ty0.shape[0]
        n_pad = (-N) % _BF
        wt = ((W + 127) // 128) * 128
        corners = _pack_corners(ty0, tx0, cy0, cx0, valid, n_pad)
        outs = _call(
            [prev, gx, gy, curr], corners,
            n_total=N + n_pad, py=py, px=px, wt=wt, batched=False,
            interpret=interpret,
        )
        return tuple(o[0, :N] for o in outs)

    @extract.def_vmap
    def _extract_batched(axis_size, in_batched, prev, gx, gy, curr,
                         ty0, tx0, cy0, cx0, valid):
        def bc(x, b):
            return x if b else jnp.broadcast_to(x, (axis_size,) + x.shape)

        prev, gx, gy, curr, ty0, tx0, cy0, cx0, valid = (
            bc(a, b) for a, b in zip(
                (prev, gx, gy, curr, ty0, tx0, cy0, cx0, valid), in_batched
            )
        )
        S, H, W = prev.shape
        N = ty0.shape[1]
        n_pad = (-N) % _BF
        wt = ((W + 127) // 128) * 128
        corners = _pack_corners(ty0, tx0, cy0, cx0, valid, n_pad)
        outs = _call(
            [prev, gx, gy, curr], corners,
            n_total=N + n_pad, py=py, px=px, wt=wt, batched=True, S=S,
            interpret=interpret,
        )
        outs = tuple(o[:, :N] for o in outs)
        return outs, (True,) * 4

    return extract


def extract_klt_patches(
    prev: jnp.ndarray,
    gx: jnp.ndarray,
    gy: jnp.ndarray,
    curr: jnp.ndarray,
    ty0: jnp.ndarray,
    tx0: jnp.ndarray,
    cy0: jnp.ndarray,
    cx0: jnp.ndarray,
    valid: jnp.ndarray,
    py: int,
    px: int,
    interpret: bool = False,
):
    """Extract (N,py,px) patches: prev/gx/gy at (ty0,tx0), curr at (cy0,cx0).

    Corners must be pre-clamped to [0, dim - {py,px}] with ty0/cy0 multiples
    of 8 (see ops/klt.py:_corners). Requires W > 128 and H >= py — the
    caller falls back to the XLA path otherwise. vmap over a leading stream
    axis dispatches one natively batched kernel (see module docstring).

    interpret=True runs the kernel in Pallas interpret mode (CI parity tests
    on CPU). In that mode W must be a multiple of 128: the kernel's 256-lane
    span reads assume the TPU's physical lane-tile padding, which interpret
    mode does not emulate — tests pad the image to the lane tile, exactly
    reproducing the TPU memory layout."""
    W = prev.shape[-1]
    assert ((W + 127) // 128) * 128 >= 256, f"image too narrow: W={W}"
    if interpret:
        assert W % 128 == 0, (
            f"interpret mode requires lane-tile-padded images (W={W}); pad "
            f"to a multiple of 128 to reproduce the TPU physical layout"
        )
    return _make_extract(py, px, interpret)(
        prev, gx, gy, curr, ty0, tx0, cy0, cx0, valid
    )
