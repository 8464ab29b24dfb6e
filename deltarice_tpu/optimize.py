"""Rice-parameter and pre-filter optimization.

The reference documents (but does not ship) an "optimal filter
determination routine" (``/root/reference/docs/Optimization.md:5-21``):
minimize the expected encoded bits per sample
``B(m, c) = sum_i P(x_i) * b(x_i, m, c)`` estimated from sample data, by
(a) sweeping the Rice parameter M over powers of two and (b) greedy
hill-climbing over integer filter coefficients, examining all neighbors
within +/-span per tap ((2*span+1)^n_taps candidates), memoizing evaluated
filters, rejecting trailing-zero taps, and stopping when no neighbor
improves. This module implements that spec TPU-natively: the bit-cost of
every (candidate filter, candidate M) pair is a vectorized JAX evaluation
over the sample waveforms — candidate filters batch on one axis, all 16
values of k evaluate simultaneously on another.
"""

from __future__ import annotations

import itertools

import jax
import jax.numpy as jnp
import numpy as np

from .config import ESCAPE_LEN, ESCAPE_Q, RiceConfig
from .ops.prefilter import prefilter_encode
from .ops.rice import zigzag

_KS = 16  # candidate k values: 0..15 (M = 1..32768)


def codeword_bits(u: jnp.ndarray, k: int | jnp.ndarray) -> jnp.ndarray:
    """Exact per-sample codeword length in bits for zigzag values u."""
    q = (u.astype(jnp.int32) >> k)
    return jnp.where(q >= ESCAPE_Q, ESCAPE_LEN, q + 1 + k)


@jax.jit
def _bits_all_k(d: jnp.ndarray) -> jnp.ndarray:
    """Mean bits/sample of filtered data d for every k in [0, 16)."""
    u = zigzag(d).ravel()
    ks = jnp.arange(_KS, dtype=jnp.int32)
    def mean_bits(k):
        return jnp.mean(codeword_bits(u, k).astype(jnp.float32))
    return jax.vmap(mean_bits)(ks)


def expected_bits(data, m: int, filt=(1, -1)) -> float:
    """Expected encoded bits/sample for the given config on sample data."""
    x = jnp.asarray(np.asarray(data, dtype=np.int16))
    d = prefilter_encode(x, tuple(int(c) for c in filt))
    cfg = RiceConfig(m)
    return float(_bits_all_k(d)[cfg.k])


def optimal_m(data, filt=(1, -1)) -> int:
    """Best power-of-two Rice parameter for the data under ``filt``."""
    x = jnp.asarray(np.asarray(data, dtype=np.int16))
    d = prefilter_encode(x, tuple(int(c) for c in filt))
    k = int(jnp.argmin(_bits_all_k(d)))
    return 1 << k


def _filter_cost(x: jnp.ndarray, filt: tuple[int, ...]) -> tuple[int, float]:
    """(best k, bits/sample at best k) for one candidate filter."""
    d = prefilter_encode(x, filt)
    bits = _bits_all_k(d)
    k = int(jnp.argmin(bits))
    return k, float(bits[k])


def _neighbors(filt: tuple[int, ...], span: int):
    """All filters within +/-span per tap, excluding trailing zeros and
    a zero leading coefficient (the inverse divides by filt[0])."""
    deltas = range(-span, span + 1)
    for offs in itertools.product(deltas, repeat=len(filt)):
        cand = tuple(c + o for c, o in zip(filt, offs))
        if cand == filt or cand[0] == 0 or (len(cand) > 1 and cand[-1] == 0):
            continue
        yield cand


def optimize(data, n_taps: int = 2, span: int = 1, start=None,
             max_rounds: int = 64) -> RiceConfig:
    """Greedy hill-climb over integer filter taps + exact M sweep.

    Returns the best :class:`RiceConfig` found (waveform_length is left at
    the default; set it from your chunking). Matches the reference's
    documented routine; lossless configs only are returned (|filt[0]|==1).
    """
    x = jnp.asarray(np.asarray(data, dtype=np.int16))
    if x.ndim == 1:
        x = x[None, :]
    cur = tuple(start) if start else ((1, -1) + (0,) * (n_taps - 2))[:n_taps]
    if len(cur) != n_taps:
        cur = (cur + (0,) * n_taps)[:n_taps]
    if cur[-1] == 0 and n_taps > 1:
        cur = cur[:-1] + (-1,)
    memo: dict[tuple[int, ...], tuple[int, float]] = {}

    def cost(f: tuple[int, ...]) -> tuple[int, float]:
        if f not in memo:
            memo[f] = _filter_cost(x, f)
        return memo[f]

    best_k, best_bits = cost(cur)
    for _ in range(max_rounds):
        improved = False
        for cand in _neighbors(cur, span):
            if abs(cand[0]) != 1:
                continue  # lossless reconstruction requires |filt[0]| == 1
            k, bits = cost(cand)
            if bits < best_bits:
                cur, best_k, best_bits, improved = cand, k, bits, True
        if not improved:
            break
    return RiceConfig(m=1 << best_k, filt=cur)
