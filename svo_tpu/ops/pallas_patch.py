"""Pallas TPU kernel: per-feature patch extraction.

The KLT tracker needs, per feature and per pyramid level, four aligned
patches (template image, its two gradients, current image). Expressed as
vmapped dynamic_slice this lowers to XLA gathers — slow on TPU and the
dominant cost of the tracker. Here each grid step issues async DMAs that
copy its patches straight out of the HBM-resident level images at
scalar-prefetched offsets: DMA engines handle arbitrary (unaligned, strided)
rectangles, which VMEM vector loads cannot (Mosaic requires tile-aligned
dynamic indices).

The four copies per feature are started together and waited together, so the
DMAs overlap; consecutive grid steps overlap naturally via the scalar
prefetch machinery.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(centers_ref, prev_ref, gx_ref, gy_ref, curr_ref,
            t_out, gx_out, gy_out, c_out, sems, *, patch: int):
    i = pl.program_id(0)
    ty = centers_ref[4 * i]
    tx = centers_ref[4 * i + 1]
    cy = centers_ref[4 * i + 2]
    cx = centers_ref[4 * i + 3]
    copies = [
        pltpu.make_async_copy(
            src.at[pl.ds(y0, patch), pl.ds(x0, patch)], dst.at[0], sems.at[k]
        )
        for k, (src, dst, y0, x0) in enumerate(
            [
                (prev_ref, t_out, ty, tx),
                (gx_ref, gx_out, ty, tx),
                (gy_ref, gy_out, ty, tx),
                (curr_ref, c_out, cy, cx),
            ]
        )
    ]
    for c in copies:
        c.start()
    for c in copies:
        c.wait()


@functools.partial(jax.jit, static_argnames=("patch",))
def extract_patches(
    prev: jnp.ndarray,
    gx: jnp.ndarray,
    gy: jnp.ndarray,
    curr: jnp.ndarray,
    t_topleft: jnp.ndarray,   # (N,2) i32 (y0, x0) template patch top-left
    c_topleft: jnp.ndarray,   # (N,2) i32 (y0, x0) current patch top-left
    patch: int,
):
    """Extract (N,patch,patch) windows from four (H,W) images.

    Top-left coordinates must already be clamped to [0, dim - patch]."""
    N = t_topleft.shape[0]
    idx = jnp.concatenate([t_topleft, c_topleft], axis=1).reshape(-1)  # y,x,y,x

    out_shape = jax.ShapeDtypeStruct((N, patch, patch), prev.dtype)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(N,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * 4,
        out_specs=[
            pl.BlockSpec((1, patch, patch), lambda i, *_: (i, 0, 0)),
        ] * 4,
        scratch_shapes=[pltpu.SemaphoreType.DMA((4,))],
    )
    return pl.pallas_call(
        functools.partial(_kernel, patch=patch),
        grid_spec=grid_spec,
        out_shape=[out_shape] * 4,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(idx, prev, gx, gy, curr)
