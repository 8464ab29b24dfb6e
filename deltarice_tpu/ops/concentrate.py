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


@functools.partial(jax.jit, static_argnums=(2,))
def concentrate(values: jnp.ndarray, disp: jnp.ndarray, n_out: int):
    """Pack valid elements to the front of each row.

    Args:
      values: (rows, R) payload.
      disp: (rows, R) int32 or int16 displacement ``slot - destination``
        for valid elements (>= 0, conflict-free monotone), ``-1`` for dead
        slots. int16 halves memory traffic and is valid whenever R < 2^15.
      n_out: static number of leading output columns to return.

    Returns:
      (rows, n_out) values with element of destination j at column j.
    """
    r = values.shape[1]
    passes = max(1, (r - 1).bit_length())
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
    return values[:, :n_out]
