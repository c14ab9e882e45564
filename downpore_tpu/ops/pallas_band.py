"""Pallas TPU kernel for the DTW band update.

The hottest loop of base-space consensus: for every (beam state x
successor x sequence) the 32-wide cost band updates as

    raw[i] = min(poffs[i], poffs[i+1], poffs[i-1]+ds[i-1],
                 poffs[i-2]+ds[i-2]+ds[i-1]) + ds[i]
    out[i] = clamp(raw[i] - min(raw))

(ref: sequence/alignment/asm_amd64.s:17-149 — the reference's hand-written
SSE kernel).  Here the whole batch of bands lives in VMEM and one grid
step updates a [BLOCK, W] tile on the VPU; min-reduction happens in the
same pass, so each band is read and written exactly once per consensus
step.  Bands are laid out [B, W] with W padded to the 128-lane width.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

try:  # TPU-only module; CPU tests run in interpret mode
    from jax.experimental.pallas import tpu as pltpu
    _HAS_PLTPU = True
except ImportError:  # pragma: no cover
    pltpu = None
    _HAS_PLTPU = False

BAND_FULL = 0xFFFF
BLOCK = 256


def _band_kernel(ds_ref, poffs_ref, out_ref, min_ref, *, threshold: int,
                 width: int):
    ds = ds_ref[:].astype(jnp.int32)
    poffs = poffs_ref[:].astype(jnp.int32)
    full = jnp.int32(BAND_FULL)
    lane = jax.lax.broadcasted_iota(jnp.int32, ds.shape, 1)
    valid = lane < width
    ds = jnp.where(valid, ds, full // 4)
    poffs = jnp.where(valid, poffs, full)

    sat = lambda x: jnp.minimum(x, full)

    def shift_right(x, n, fill):
        # x[i] <- x[i-n] with `fill` in the first n lanes
        rolled = jnp.roll(x, n, axis=1)
        return jnp.where(lane < n, fill, rolled)

    def shift_left(x, fill):
        rolled = jnp.roll(x, -1, axis=1)
        return jnp.where(lane >= width - 1, fill, rolled)

    step = poffs
    stay = shift_left(poffs, full)
    pd = sat(poffs + ds)
    skip1 = shift_right(pd, 1, full)
    skip2 = shift_right(sat(pd + shift_left(ds, full // 4)), 2, full)
    # note: skip2[i] = poffs[i-2] + ds[i-2] + ds[i-1]
    best = jnp.minimum(jnp.minimum(step, stay), jnp.minimum(skip1, skip2))
    raw = sat(best + ds)
    raw = jnp.where(valid, raw, full)
    m = jnp.min(raw, axis=1, keepdims=True)
    out = jnp.maximum(raw - m, 0)
    out = jnp.where(out >= threshold, full, out)
    out_ref[:] = out
    min_ref[:] = m


@functools.partial(jax.jit, static_argnames=("threshold", "interpret"))
def pallas_update_bands(ds: jax.Array, poffs: jax.Array, threshold: int,
                        interpret: bool = False):
    """Batched band update: ``ds``/``poffs`` are ``[B, W]`` int32; returns
    (out [B, W] int32, min [B] int32).  B is padded to a BLOCK multiple and
    W to the 128-lane width internally."""
    B, W = ds.shape
    WP = max(128, ((W + 127) // 128) * 128)
    BP = ((B + BLOCK - 1) // BLOCK) * BLOCK
    dsp = jnp.full((BP, WP), BAND_FULL // 4, jnp.int32).at[:B, :W].set(
        ds.astype(jnp.int32))
    pop = jnp.full((BP, WP), BAND_FULL, jnp.int32).at[:B, :W].set(
        poffs.astype(jnp.int32))
    kernel = functools.partial(_band_kernel, threshold=threshold, width=W)
    grid = (BP // BLOCK,)
    out, m = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((BLOCK, WP), lambda i: (i, 0)),
            pl.BlockSpec((BLOCK, WP), lambda i: (i, 0)),
        ],
        out_specs=[
            pl.BlockSpec((BLOCK, WP), lambda i: (i, 0)),
            pl.BlockSpec((BLOCK, 1), lambda i: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((BP, WP), jnp.int32),
            jax.ShapeDtypeStruct((BP, 1), jnp.int32),
        ],
        interpret=interpret,
    )(dsp, pop)
    return out[:B, :W], m[:B, 0]
