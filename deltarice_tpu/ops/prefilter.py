"""Causal integer pre-filters (delta encoding and generic FIR) and their
inverses, as vectorized int16 JAX ops.

Semantics match the reference byte-for-byte
(``/root/reference/src/deltaRice.c:49-103``):

* encode, delta fast path (filter ``[1,-1]``): first sample verbatim, then
  successive differences, all in wrapping 16-bit arithmetic.
* encode, generic: causal FIR ``out[i] = sum_j x[i-j] * filt[j]`` with
  implicit zero padding for ``i-j < 0``. The reference accumulates into a C
  ``short``; since addition/multiplication mod 2**16 form a ring
  homomorphism, computing each tap in int16 here is bit-identical.
* decode, delta: running prefix sum (int16 wraparound) — here a single
  ``associative_scan`` instead of the reference's sequential loop.
* decode, generic: the recursive IIR inverse
  ``out[i] = (in[i] - sum_{j>=1} out[i-j]*filt[j]) / filt[0]`` where the
  division is C integer division (truncation toward zero) applied to the
  *wrapped* int16 numerator — exact reconstruction requires |filt[0]| == 1.

All functions operate on the last axis and broadcast over leading axes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..config import DELTA_FILTER


def _c16(c: int) -> np.int16:
    """Filter coefficient reduced mod 2**16 into int16 (wrapping, like the
    reference's accumulate-into-short arithmetic)."""
    return np.int16(((int(c) & 0xFFFF) ^ 0x8000) - 0x8000)


def _shift_right(x: jnp.ndarray, j: int) -> jnp.ndarray:
    """x delayed by j samples along the last axis, zero-filled."""
    if j == 0:
        return x
    pad = [(0, 0)] * (x.ndim - 1) + [(j, 0)]
    return jnp.pad(x, pad)[..., : x.shape[-1]]


def prefilter_encode(x: jnp.ndarray, filt: tuple[int, ...] = DELTA_FILTER,
                     prev0: jnp.ndarray | None = None) -> jnp.ndarray:
    """Apply the causal pre-filter. x: int16, filtered along the last axis.

    prev0: optional per-row sample preceding ``x[..., 0]`` (int16). Delta
    filter only — it is the recurrence's entire cross-block state, so
    sub-block splits of a long waveform encode bit-identically to the
    serial pass when each block passes its predecessor's last sample.
    """
    x = x.astype(jnp.int16)
    if tuple(filt) == DELTA_FILTER:
        d = x - _shift_right(x, 1)
        if prev0 is not None:
            first = x[..., :1] - prev0.astype(jnp.int16)[..., None]
            d = jnp.concatenate([first, d[..., 1:]], axis=-1)
        return d
    if prev0 is not None:
        raise ValueError("prev0 is only supported for the delta filter")
    acc = x * _c16(filt[0])
    for j, c in enumerate(filt[1:], start=1):
        acc = acc + _shift_right(x, j) * _c16(c)
    return acc


def prefilter_decode(d: jnp.ndarray, filt: tuple[int, ...] = DELTA_FILTER) -> jnp.ndarray:
    """Invert the causal pre-filter along the last axis."""
    d = d.astype(jnp.int16)
    if tuple(filt) == DELTA_FILTER:
        return jax.lax.associative_scan(jnp.add, d, axis=-1)
    return _iir_decode(d, filt)


@functools.partial(jax.jit, static_argnums=(1,))
def _iir_decode(d: jnp.ndarray, filt: tuple[int, ...]) -> jnp.ndarray:
    """Sequential IIR inverse for generic filters (short scan per tap count).

    filt[0] == 1 or -1 gives exact reconstruction; other leading coefficients
    replicate the reference's truncating division (lossy in general).
    """
    ntaps = len(filt)
    f0_int = int(_c16(filt[0]))  # encode wraps every tap mod 2**16
    if ntaps == 1:
        num = d.astype(jnp.int32)
        if f0_int == 1:
            return d
        return jax.lax.div(num, jnp.int32(f0_int)).astype(jnp.int16)

    taps = jnp.asarray([_c16(c) for c in filt[1:]], dtype=jnp.int16)
    f0 = jnp.int32(f0_int)

    def step(hist, din):
        # hist: last (ntaps-1) outputs, hist[0] most recent; din: batch of new
        # filtered samples. Numerator wraps in int16, division truncates
        # toward zero on the wrapped value (C semantics).
        num = din - jnp.sum(hist * taps[None, :], axis=-1, dtype=jnp.int16)
        if f0_int == 1:
            out = num
        elif f0_int == -1:
            out = -num
        else:
            out = jax.lax.div(num.astype(jnp.int32), f0).astype(jnp.int16)
        hist = jnp.concatenate([out[:, None], hist[:, :-1]], axis=-1)
        return hist, out

    batch_shape = d.shape[:-1]
    flat = d.reshape((-1, d.shape[-1]))
    hist0 = jnp.zeros((flat.shape[0], ntaps - 1), dtype=jnp.int16)
    _, out = jax.lax.scan(step, hist0, jnp.swapaxes(flat, 0, 1))
    return jnp.swapaxes(out, 0, 1).reshape(batch_shape + (d.shape[-1],))
