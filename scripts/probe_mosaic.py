"""Minimal Mosaic capability probes backing docs/mosaic_limits.md.

Each probe is a tiny pallas_call compiled on the live chip; run prints
OK / FAIL per probe. (FAILs are expected for the documented limits.)

    python scripts/probe_mosaic.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

x = jnp.asarray(np.random.rand(32, 48, 64).astype(np.float32))
o = jnp.asarray((np.random.rand(32, 8) * 5).astype(np.float32))


def run(name, kern, note):
    try:
        r = pl.pallas_call(
            kern, out_shape=jax.ShapeDtypeStruct((32, 1), jnp.float32)
        )(x, o)
        jax.block_until_ready(r)
        print(f"{name}: OK   ({note})")
    except Exception as e:  # noqa: BLE001
        print(f"{name}: FAIL ({note}) -> {str(e).splitlines()[0][:90]}")


def out(out_ref, v):
    out_ref[...] = v


run("3d-slice-zero-offset",
    lambda xr, orf, outr: out(outr, jnp.sum(
        jax.lax.slice(xr[...], (0, 0, 0), (32, 34, 21)), axis=(1, 2))[:, None]),
    "docs #1: any 3-D value slice SIGABRTs")
run("3d-slice-full-lanes",
    lambda xr, orf, outr: out(outr, jnp.sum(
        jax.lax.slice(xr[...], (0, 0, 3), (32, 34, 64)), axis=(1, 2))[:, None]),
    "docs #1")
run("2d-slice-lane-offset",
    lambda xr, orf, outr: out(outr, jnp.broadcast_to(
        jnp.sum(jax.lax.slice(xr[0], (0, 3), (34, 24)))[None, None], (32, 1))),
    "2-D slices work")
run("int-index-value",
    lambda xr, orf, outr: out(outr, (orf[...][:, 0])[:, None]),
    "docs #2: int indexing -> gather")
run("1d-arange-broadcast",
    lambda xr, orf, outr: out(outr, jnp.sum(
        jnp.abs(orf[...][:, 0:1] - jnp.arange(14, dtype=jnp.float32)),
        axis=1)[:, None]),
    "docs #3: 1-D iota broadcast -> gather")
run("2d-int-iota",
    lambda xr, orf, outr: out(outr, jnp.sum(
        jnp.abs(orf[...][:, 0:1] - jax.lax.broadcasted_iota(
            jnp.int32, (32, 14), 1).astype(jnp.float32)), axis=1)[:, None]),
    "docs #3 workaround works")
run("negative-static-roll",
    lambda xr, orf, outr: out(outr, jnp.sum(
        pltpu.roll(xr[0], -3, 0), axis=(0, 1))[None, None]
        * jnp.ones((32, 1), jnp.float32)),
    "docs #5: negative shift rejected")
