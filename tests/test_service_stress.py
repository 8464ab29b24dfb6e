"""Adversarial stress of the reduced-service decode ladder and its hint.

The service kernel decodes J codewords per word and absorbs transient
bursts through a 2-word lookback window (``unpack_pallas._LOOKBACK``);
anything deeper must FLAG and re-decode exactly. These tests construct
streams that defeat the lookback on purpose and fuzz the
``_service_hint`` quantile branch that sizes J for mixed batches.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deltarice_tpu.codec import (
    _decode_segments_scan,
    _redecode_bad_rows,
    _service_hint,
)
from deltarice_tpu.config import RiceConfig
from deltarice_tpu.ops.pack_xla import pack_bits
from deltarice_tpu.ops.prefilter import prefilter_encode
from deltarice_tpu.ops.rice import codeword_lengths_values, zigzag
from deltarice_tpu.ops.unpack_pallas import (
    codewords_per_word,
    unpack_decode_pallas,
)

tpu_only = pytest.mark.skipif(
    jax.default_backend() != "tpu", reason="needs a TPU for the Mosaic kernel"
)


def _encode(x, k):
    d = prefilter_encode(jnp.asarray(x))
    u = zigzag(d)
    lens, vals = codeword_lengths_values(u, k)
    max_words = (x.shape[-1] * 25 + 31) // 32
    words, _ = pack_bits(lens, vals, max_words, "segsum")
    return jnp.pad(words, ((0, 0), (0, 2)))


def _burst_data(nseg, length, burst_rows, burst_len, seed=0):
    """Escape-heavy rows (~1.28 starts/word at k=3); ``burst_rows`` get a
    mid-stream run of ``burst_len`` constant samples whose 4-bit
    codewords arrive at 8 starts/word — service rate 2 falls behind by
    ~6 words per word, far past the 2-word lookback."""
    rng = np.random.default_rng(seed)
    x = rng.integers(-32768, 32768, (nseg, length)).astype(np.int16)
    mid = length // 2
    for i in burst_rows:
        x[i, mid : mid + burst_len] = x[i, mid - 1]
    return x


@tpu_only
def test_ladder_burst_beyond_lookback_flags_and_recovers():
    k, length = 3, 4000
    burst_rows = [1, 7, 12]
    x = _burst_data(16, length, burst_rows, 1200)
    words = _encode(x, k)
    out, bad = unpack_decode_pallas(words, length, k, True, False, 2)
    bad = np.asarray(bad)
    assert bad[burst_rows].all(), "deep lag must flag"
    fixed = _redecode_bad_rows(np.asarray(out), bad, np.asarray(words),
                               length, RiceConfig(1 << k, length))
    np.testing.assert_array_equal(fixed, x)


@tpu_only
def test_ladder_exact_arrival_rate_no_corruption():
    # starts/word pinned AT a ladder J: alternating codeword lengths
    # averaging exactly 32/J bits; lag hovers at zero and the lookback
    # must absorb every excursion without silent corruption
    k, length = 3, 4096
    rng = np.random.default_rng(1)
    # deltas alternating between 4-bit (q=0) and 12-bit (q=8 escape
    # boundary is 25; use q=7 -> 11 bits) codewords: mean ~7.5 bits
    lo = rng.integers(0, 8, (8, length // 2))       # u < 8 -> 4 bits
    hi = rng.integers(7 << k, 8 << k, (8, length // 2))  # q=7 -> 11 bits
    u = np.empty((8, length), np.int64)
    u[:, 0::2] = lo
    u[:, 1::2] = hi
    d = ((u >> 1) ^ -(u & 1)).astype(np.int16)  # un-zigzag to deltas
    x = np.cumsum(d.astype(np.int64), axis=1).astype(np.int16)
    words = _encode(x, k)
    j = 5  # mean starts/word = 32/7.5 = 4.27 -> ladder would pick 5
    out, bad = unpack_decode_pallas(words, length, k, True, False, j)
    fixed = _redecode_bad_rows(np.asarray(out), np.asarray(bad),
                               np.asarray(words), length,
                               RiceConfig(1 << k, length))
    np.testing.assert_array_equal(fixed, x)


def test_service_hint_quantile_fuzz():
    """Fuzz `_service_hint`'s q99 branch: the hint must always sit at or
    above the 99th-percentile arrival rate (safety: outliers flag) and
    below the static bound when the batch is mostly sparse."""
    k = 3
    j_max = codewords_per_word(k)
    rng = np.random.default_rng(42)
    length = 7000
    for _ in range(50):
        n = int(rng.integers(10, 2000))
        dense_frac = float(rng.uniform(0, 0.05))
        spw = rng.uniform(1.1, 2.5, n)
        n_dense = int(n * dense_frac)
        if n_dense:
            spw[:n_dense] = rng.uniform(6.0, 8.0, n_dense)
        counts = (length / spw).astype(np.int64)
        nvalid = np.full(n, length, np.int64)
        j = _service_hint(counts, nvalid, k)
        if j is None:
            continue
        assert 2 <= j < j_max
        q99 = np.quantile(length / counts, 0.99)
        hi = (length / counts).max()
        need = q99 if hi > 2.0 * q99 else hi
        assert j >= need, (j, need)


def test_service_hint_dense_minority_keeps_low_rate():
    # 1% dense segments must not force the whole batch to the full
    # unroll: the quantile branch sizes J for the sparse majority
    counts = np.full(1000, 5500, np.int64)   # ~1.27 starts/word
    counts[:10] = 900                        # ~7.8 starts/word outliers
    j = _service_hint(counts, np.full(1000, 7000, np.int64), 3)
    assert j == 2
