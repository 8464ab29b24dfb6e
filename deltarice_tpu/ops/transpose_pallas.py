"""Tiled Pallas transpose for the decode staging buffers.

XLA's int16 transpose of the (blocks, rows, 128) staging layout costs ~5 ms
for 10 M elements on v5e — 5x the decode kernel itself — so the lane<->row
swap runs as a 128x128-tiled Mosaic kernel instead (pure VMEM traffic,
memory-bound).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TILE = 128


def _tr_kernel(x_ref, o_ref):
    o_ref[:, :] = x_ref[:, :].T


def _tile_sizes(a: int, b: int, itemsize: int) -> tuple[int, int]:
    """Block shape: grow tiles toward ~1 MB so HBM bursts reach 1 KB+
    and per-step overhead amortizes (measured v5e: int16 tall-skinny
    19 -> 31 GB/s going 128x128 -> 2048x128).
    ``DELTARICE_TPU_TR_TILE`` caps the tile edge (128 = the old fixed
    tiling) for A/B benchmarking."""
    import os

    cap = int(os.environ.get("DELTARICE_TPU_TR_TILE", "2048"))
    budget = (1 << 20) // itemsize  # elements per ~1 MB block
    ta = tb = _TILE
    while ta < a and ta < cap and 2 * ta * tb <= budget:
        ta *= 2
    while tb < b and tb < cap and 2 * ta * tb <= budget:
        tb *= 2
    return ta, tb


@functools.partial(jax.jit, static_argnums=(1,))
def transpose2d(x: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """(A, B) -> (B, A), padding both axes up to multiples of the tile."""
    a, b = x.shape
    ta, tb = _tile_sizes(a, b, x.dtype.itemsize)
    ap = -(-a // ta) * ta
    bp = -(-b // tb) * tb
    if (ap, bp) != (a, b):
        x = jnp.pad(x, ((0, ap - a), (0, bp - b)))
    out = pl.pallas_call(
        _tr_kernel,
        grid=(ap // ta, bp // tb),
        in_specs=[
            pl.BlockSpec((ta, tb), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec((tb, ta), lambda i, j: (j, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bp, ap), x.dtype),
        interpret=interpret,
    )(x)
    return out[:b, :a]
