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


@functools.partial(jax.jit, static_argnums=(1,))
def transpose2d(x: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """(A, B) -> (B, A), padding both axes up to multiples of 128."""
    a, b = x.shape
    ap = -(-a // _TILE) * _TILE
    bp = -(-b // _TILE) * _TILE
    if (ap, bp) != (a, b):
        x = jnp.pad(x, ((0, ap - a), (0, bp - b)))
    out = pl.pallas_call(
        _tr_kernel,
        grid=(ap // _TILE, bp // _TILE),
        in_specs=[
            pl.BlockSpec((_TILE, _TILE), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec((_TILE, _TILE), lambda i, j: (j, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bp, ap), x.dtype),
        interpret=interpret,
    )(x)
    return out[:b, :a]
