"""Pallas word-synchronous decode kernel vs the XLA scan oracle.

These run only when a real TPU is attached (the kernel targets Mosaic;
interpret mode is impractically slow under the remote-compile setup).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deltarice_tpu.codec import _decode_segments_scan, decode_segments
from deltarice_tpu.config import RiceConfig
from deltarice_tpu.ops.prefilter import prefilter_encode
from deltarice_tpu.ops.rice import codeword_lengths_values, zigzag
from deltarice_tpu.ops.pack_xla import pack_bits
from deltarice_tpu.ops.unpack_pallas import (
    unpack_decode_pallas,
)

tpu_only = pytest.mark.skipif(
    jax.default_backend() != "tpu", reason="needs a TPU for the Mosaic kernel"
)


def _encode(x, k, pad_cols=2):
    d = prefilter_encode(jnp.asarray(x))
    u = zigzag(d)
    lens, vals = codeword_lengths_values(u, k)
    max_words = (x.shape[-1] * 25 + 31) // 32
    words, nwords = pack_bits(lens, vals, max_words, "segsum")
    return jnp.pad(words, ((0, 0), (0, pad_cols)))


@tpu_only
@pytest.mark.parametrize("k", [0, 3, 15])
def test_kernel_matches_input_all_k(k):
    rng = np.random.default_rng(k)
    x = np.round(np.cumsum(rng.normal(0, 10, (9, 160)), axis=-1)).astype(
        np.int16
    )
    words = _encode(x, k)
    out = unpack_decode_pallas(words, 160, k, True)
    np.testing.assert_array_equal(np.asarray(out), x)


@tpu_only
@pytest.mark.slow
@pytest.mark.parametrize("k", [1, 7, 13])
def test_kernel_matches_input_all_k_deep(k):
    """The remaining k values (each k compiles its own Mosaic kernel)."""
    test_kernel_matches_input_all_k(k)


@tpu_only
def test_kernel_escape_heavy():
    """Uniform full-range int16: nearly every codeword is an escape."""
    rng = np.random.default_rng(1)
    x = rng.integers(-32768, 32768, (5, 300)).astype(np.int16)
    words = _encode(x, 3)
    out = unpack_decode_pallas(words, 300, 3, True)
    np.testing.assert_array_equal(np.asarray(out), x)


@tpu_only
def test_kernel_multi_block():
    """More than 128 segments exercises the lane-block grid."""
    rng = np.random.default_rng(2)
    x = np.round(np.cumsum(rng.normal(0, 6, (300, 96)), axis=-1)).astype(
        np.int16
    )
    words = _encode(x, 3)
    out = unpack_decode_pallas(words, 96, 3, True)
    np.testing.assert_array_equal(np.asarray(out), x)


@tpu_only
def test_kernel_vs_scan_oracle():
    rng = np.random.default_rng(3)
    x = np.round(np.cumsum(rng.normal(0, 10, (4, 200)), axis=-1)).astype(
        np.int16
    )
    cfg = RiceConfig(8, 200)
    words = _encode(x, cfg.k)
    a = np.asarray(unpack_decode_pallas(words, 200, cfg.k, True))
    b = np.asarray(_decode_segments_scan(words, 200, cfg))
    np.testing.assert_array_equal(a, b)


@tpu_only
def test_decode_segments_auto_picks_pallas():
    rng = np.random.default_rng(4)
    x = np.round(np.cumsum(rng.normal(0, 10, (3, 128)), axis=-1)).astype(
        np.int16
    )
    cfg = RiceConfig(8, 128)
    words = _encode(x, cfg.k)
    out = decode_segments(words, 128, cfg, backend="auto")
    np.testing.assert_array_equal(np.asarray(out), x)


@pytest.mark.slow
@tpu_only
def test_packed_plane_wide_slot_axis_k15():
    """k=15 staging: j_max=2 keeps every displacement inside the packed
    15-bit field while the slot axis (W * j_max) crosses 2**15 — this
    crashed the packed butterfly with an int32 overflow (``s << 16`` at
    stride 2**15) before such shapes were routed to the blocked wide
    concentration path."""
    rng = np.random.default_rng(15)
    x = np.round(np.cumsum(rng.normal(0, 4, (2, 40000)), axis=-1)).astype(
        np.int16
    )
    words = _encode(x, 15)
    out = unpack_decode_pallas(words, 40000, 15, True)
    np.testing.assert_array_equal(np.asarray(out), x)


def test_service_hint_regimes():
    """Header stats -> service rate: hostile regimes get small J, dense
    matched-M regimes stay on the exact full-unroll path."""
    from deltarice_tpu.codec import _service_hint

    nv = np.full(4, 7000)
    # escape-heavy: ~1.28 starts/word -> minimal service rate (ladder-
    # bucketed {2..8,12} so the compiled variant set stays small)
    assert _service_hint(np.full(4, 5469), nv, 3) == 2
    # mismatched M=2: ~2.2 starts/word vs bound 16
    assert _service_hint(np.full(4, 3200), nv, 1) == 3
    # matched Nab walk data: ~5.8 starts/word vs bound 8 -> J=6 (the
    # thin-margin win: exact header means + positive queue drift)
    assert _service_hint(np.full(4, 1210), nv, 3) == 6
    # ~7.4 starts/word: no ladder step below the bound -> exact
    assert _service_hint(np.full(4, 940), nv, 3) is None
    # degenerate zero counts don't divide by zero
    assert _service_hint(np.zeros(2), np.full(2, 10), 3) is None
    # a dense 1% minority in a hostile batch must not forfeit the
    # reduced rate: J sizes to the 99th percentile, the outliers ride
    # the lag flags into the exact re-decode
    counts = np.full(1024, 5469)
    counts[:5] = 940  # five dense matched-M segments (~7.4 starts/word)
    assert _service_hint(counts, np.full(1024, 7000), 3) == 2
    # ...but when the "outliers" are a third of the batch, the max rules
    counts[:400] = 940
    assert _service_hint(counts, np.full(1024, 7000), 3) is None


@tpu_only
def test_service_kernel_escape_heavy_roundtrip():
    """Reduced-service decode (J=3 vs bound 8) on pure-escape streams."""
    rng = np.random.default_rng(8)
    x = rng.integers(-32768, 32768, (9, 1000)).astype(np.int16)
    words = _encode(x, 3)
    out, bad = unpack_decode_pallas(words, 1000, 3, True, False, 3)
    from deltarice_tpu.codec import _redecode_bad_rows

    got = _redecode_bad_rows(np.asarray(out), bad, np.asarray(words),
                             1000, RiceConfig(8, 1000))
    np.testing.assert_array_equal(got, x)


@pytest.mark.slow
@tpu_only
def test_service_kernel_lookback_absorbs_bursts():
    """Mixed mismatched-M data: many words exceed the service rate and
    must be absorbed by the lookback window, not flagged."""
    rng = np.random.default_rng(9)
    x = np.round(np.cumsum(rng.normal(0, 10, (17, 3000)), axis=-1)).astype(
        np.int16
    )
    words = _encode(x, 1)  # k=1: j_max=16, mean starts/word ~2.3
    out, bad = unpack_decode_pallas(words, 3000, 1, True, False, 4)
    from deltarice_tpu.codec import _redecode_bad_rows

    got = _redecode_bad_rows(np.asarray(out), bad, np.asarray(words),
                             3000, RiceConfig(2, 3000))
    np.testing.assert_array_equal(got, x)


@pytest.mark.slow
@tpu_only
def test_service_kernel_underprovisioned_flags_and_recovers():
    """A service rate far below the data's density floods the lookback
    window: segments flag and the exact re-decode restores correctness."""
    rng = np.random.default_rng(10)
    x = np.round(np.cumsum(rng.normal(0, 10, (6, 800)), axis=-1)).astype(
        np.int16
    )
    words = _encode(x, 3)  # matched M=8: ~6-7 starts/word vs J=2
    out, bad = unpack_decode_pallas(words, 800, 3, True, False, 2)
    badn = np.asarray(bad)
    assert badn.any(), "underprovisioned decode must flag"
    from deltarice_tpu.codec import _redecode_bad_rows

    got = _redecode_bad_rows(np.asarray(out), badn, np.asarray(words),
                             800, RiceConfig(8, 800))
    np.testing.assert_array_equal(got, x)


def _encode_bucketed(x, k, bucket=256):
    """Encode and trim the word axis to the production word bucket, so
    the decode routing sees the same static shapes ``decompress`` would."""
    d = prefilter_encode(jnp.asarray(x))
    u = zigzag(d)
    lens, vals = codeword_lengths_values(u, k)
    max_words = (x.shape[-1] * 25 + 31) // 32
    words, nwords = pack_bits(lens, vals, max_words, "segsum")
    w = int(np.asarray(nwords).max()) + 1
    return jnp.asarray(np.asarray(words)[:, : -(-w // bucket) * bucket])


@pytest.mark.slow
@tpu_only
def test_bias_plane_exact_midrange_disp():
    """Displacement bound in [2**15, 2**16): the decode rides the
    sign-biased tiled plane EXACTLY (no clamping possible, no flags)."""
    rng = np.random.default_rng(11)
    x = np.round(np.cumsum(rng.normal(0, 10, (9, 30000)), axis=-1)).astype(
        np.int16
    )
    words = _encode_bucketed(x, 3)
    from deltarice_tpu.ops.unpack_pallas import codewords_per_word
    bound = (words.shape[1] - 1) * (codewords_per_word(3) - 1)
    assert (1 << 15) <= bound < (1 << 16), f"case drifted: {bound}"
    out = unpack_decode_pallas(words, 30000, 3, True)
    np.testing.assert_array_equal(np.asarray(out), x)


@pytest.mark.slow
@tpu_only
def test_bias_plane_speculative_clamp_roundtrip():
    """Static displacement bound over 16 bits with typical displacements
    far under it: the kernel clamps (rarely) + flags, the biased tiled
    butterfly runs, flagged segments re-decode exactly."""
    rng = np.random.default_rng(12)
    # 62000 samples at sigma=10 pack to ~10.3k words: the static bound
    # (W-1)*(j_max-1) clears 2**16 (50000 undershot it at ~60.9k — this
    # precondition was authored off-hardware in round 3 and first ran on
    # a chip in round 4)
    x = np.round(np.cumsum(rng.normal(0, 10, (6, 62000)), axis=-1)).astype(
        np.int16
    )
    words = _encode_bucketed(x, 3)
    bound = (words.shape[1] - 1) * 7
    assert bound >= (1 << 16), f"case drifted: {bound}"
    res = unpack_decode_pallas(words, 62000, 3, True, False, None, True)
    assert isinstance(res, tuple), "speculative path must return flags"
    out, bad = res
    from deltarice_tpu.codec import _redecode_bad_rows

    got = _redecode_bad_rows(np.asarray(out), np.asarray(bad),
                             np.asarray(words), 62000,
                             RiceConfig(8, 62000))
    np.testing.assert_array_equal(got, x)


@pytest.mark.slow
@tpu_only
def test_long_waveforms_noptrex_geometry():
    """500k-sample waveforms — the published NOPTREX segment length
    (reference docs/Performance.md:38) — through both Mosaic kernels."""
    rng = np.random.default_rng(7)
    x = np.round(np.cumsum(rng.normal(0, 8, (4, 500000)), axis=-1)).astype(
        np.int16
    )
    import deltarice_tpu as drt

    cfg = RiceConfig(8, 500000)
    blob = drt.compress(x, cfg, method="pallas")
    rt = drt.decompress(blob, cfg, backend="pallas")
    np.testing.assert_array_equal(rt.reshape(4, -1), x)
