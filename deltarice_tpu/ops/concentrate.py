"""Gather-free stream compaction: butterfly concentration.

Both codec kernels leave their output in "sorted with gaps" form: valid
elements whose destination indices are strictly increasing along the slot
axis, interleaved with dead slots. Compacting that to a dense stream is the
classic *data concentration* problem, and the hypercube routing result
(Nassimi & Sahni) applies: with distinct, monotone destinations, routing
LSB-first through log2 stages — "move left by 2^b iff bit b of your
remaining displacement is set" — is conflict-free.

That gives an O(R log R) compaction built ONLY from static shifts and
selects: no gathers (~56 Melem/s on TPU), no scatters, and ~14 passes
instead of a bitonic sort's ~196. Each pass is a shift-left-by-2^b of the
(value, displacement) pair plus two selects.

Proof sketch of conflict-freedom: displacements d_p = p - dest_p are
non-negative and, because destinations are strictly increasing and slots
advance by one, satisfy d_q - d_p <= q - p for valid p < q with equality
only through dead slots. After clearing bits 0..b-1, two valid elements
can land on the same slot only if their cleared displacements differ by
exactly their slot distance — which would force equal destinations,
contradicting distinctness.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _shift_left(x: jnp.ndarray, s: int, fill):
    """x[:, i] <- x[:, i+s], zero/fill-padded on the right (static s)."""
    return jnp.pad(
        x[:, s:], ((0, 0), (0, s)), constant_values=fill
    )


def _clip_cols(x: jnp.ndarray, n_out: int):
    """First n_out columns, zero-padded when the slot axis is narrower
    (a stream shorter than its segment stages fewer slots than the
    requested samples; the surplus tail is garbage-by-contract)."""
    if x.shape[1] < n_out:
        x = jnp.pad(x, ((0, 0), (0, n_out - x.shape[1])))
    return x[:, :n_out]


@functools.partial(jax.jit, static_argnums=(2,))
def concentrate(values: jnp.ndarray, disp: jnp.ndarray, n_out: int):
    """Pack valid elements to the front of each row.

    Args:
      values: (rows, R) payload, 16-bit (int16/uint32-with-16-significant
        bits are both fine — the low 16 bits are preserved).
      disp: (rows, R) int32 or int16 displacement ``slot - destination``
        for valid elements (>= 0, conflict-free monotone), ``-1`` for dead
        slots.
      n_out: static number of leading output columns to return.

    Returns:
      (rows, n_out) values (same dtype) with destination j at column j.

    When both displacement and payload fit 16 bits (always true for this
    codec: R < 2^15 and samples/words-in-16-bit-halves), the pair packs
    into one int32 ``disp << 16 | val`` so each routing pass is a single
    shifted select — fewer ops and half the arrays of the two-plane form.
    """
    r = values.shape[1]
    passes = max(1, (r - 1).bit_length())
    if r < (1 << 15) and values.dtype.itemsize <= 2:
        packed = (disp.astype(jnp.int32) << 16) | (
            values.astype(jnp.int32) & 0xFFFF
        )
        dead = jnp.int32(-1 << 16)  # disp == -1, value 0
        for b in range(passes):
            s = 1 << b
            if s >= r:
                break
            in_p = _shift_left(packed, s, dead)
            moving = (in_p >= 0) & (((in_p >> 16) & s) != 0)
            staying = (packed >= 0) & (((packed >> 16) & s) == 0)
            packed = jnp.where(
                moving, in_p - (s << 16), jnp.where(staying, packed, dead)
            )
        out = (_clip_cols(packed, n_out) & 0xFFFF).astype(jnp.int32)
        if values.dtype == jnp.int16:
            return ((out << 16) >> 16).astype(jnp.int16)
        return out.astype(values.dtype)
    for b in range(passes):
        s = 1 << b
        if s >= r:
            break
        in_val = _shift_left(values, s, 0)
        in_disp = _shift_left(disp, s, -1)
        moving = (in_disp >= 0) & ((in_disp & s) != 0)
        staying = (disp >= 0) & ((disp & s) == 0)
        values = jnp.where(moving, in_val, jnp.where(staying, values, 0))
        disp = jnp.where(
            moving, in_disp - s, jnp.where(staying, disp, -1)
        )
    return _clip_cols(values, n_out)
