"""Rice (Golomb power-of-2) codeword math: zigzag mapping, per-sample
codeword lengths and bit patterns.

Bitstream contract (frozen; matches ``/root/reference/src/deltaRice.c``):

* zigzag (``:207-211``): ``u = 2x`` for ``x >= 0``, ``u = -2x - 1`` for
  ``x < 0`` — u in [0, 65535].
* codeword (``:215-227``): with ``q = u >> k``, ``r = u & (M-1)``:
  ``q`` zeros, a ``1``, then the k-bit remainder — unless ``q >= 8``, in
  which case the *escape*: 8 zeros, a ``1``, then u verbatim in 16 bits.
* un-zigzag (``:174-177``): even ``u`` -> ``u >> 1``; odd -> ``-((u+1) >> 1)``.

Everything here is per-sample elementwise math (VPU-friendly); the bit
positioning/packing lives in :mod:`.pack_xla` and the Pallas kernels.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..config import ESCAPE_LEN, ESCAPE_Q


def zigzag(x: jnp.ndarray) -> jnp.ndarray:
    """int16 -> uint32 zigzag code in [0, 65535]."""
    xi = x.astype(jnp.int32)
    return jnp.where(xi >= 0, xi << 1, (-xi << 1) - 1).astype(jnp.uint32)


def unzigzag(u: jnp.ndarray) -> jnp.ndarray:
    """uint32 zigzag code -> int16."""
    ui = u.astype(jnp.int32)
    return jnp.where(ui & 1 == 0, ui >> 1, -((ui + 1) >> 1)).astype(jnp.int16)


def codeword_lengths_values(u: jnp.ndarray, k: int):
    """Per-sample codeword (length in bits, right-aligned bit pattern).

    The pattern's integer value encodes everything after the leading zeros:
    non-escape = ``(1 << k) | r`` over ``q+1+k`` bits, escape =
    ``(1 << 16) | u`` over 25 bits. Both fit in 17 bits, so downstream
    packing can treat codewords as (value, length) pairs in uint32.
    """
    u = u.astype(jnp.uint32)
    q = (u >> k).astype(jnp.int32)
    r = u & jnp.uint32((1 << k) - 1)
    esc = q >= ESCAPE_Q
    lens = jnp.where(esc, ESCAPE_LEN, q + 1 + k)
    vals = jnp.where(esc, jnp.uint32(1 << 16) | u, jnp.uint32(1 << k) | r)
    return lens, vals
