"""Pallas fused encode kernel vs the XLA packer oracle (TPU only)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deltarice_tpu.codec import _encode_segments_xla, encode_segments
from deltarice_tpu.config import RiceConfig
from deltarice_tpu.ops.pack_pallas import pack_encode_pallas

tpu_only = pytest.mark.skipif(
    jax.default_backend() != "tpu", reason="needs a TPU for the Mosaic kernel"
)


def _compare(x, nvalid, cfg):
    mw = cfg.max_words(x.shape[1])
    xj = jnp.asarray(x)
    nv = jnp.asarray(nvalid)
    w_p, n_p = encode_segments(xj, nv, cfg, mw, "pallas")
    w_x, n_x, _ = _encode_segments_xla(xj, nv, cfg, mw, "segsum")
    np.testing.assert_array_equal(np.asarray(n_p), np.asarray(n_x))
    np.testing.assert_array_equal(np.asarray(w_p), np.asarray(w_x))


@tpu_only
@pytest.mark.parametrize("k", [0, 1, 3, 7, 13, 15])
def test_kernel_matches_xla_all_k(k):
    rng = np.random.default_rng(k)
    x = np.round(np.cumsum(rng.normal(0, 10, (9, 300)), axis=-1)).astype(
        np.int16
    )
    nv = np.full(9, 300, np.int32)
    _compare(x, nv, RiceConfig(1 << k, 300))


@tpu_only
def test_kernel_escape_heavy():
    rng = np.random.default_rng(1)
    x = rng.integers(-32768, 32768, (5, 700)).astype(np.int16)
    nv = np.full(5, 700, np.int32)
    _compare(x, nv, RiceConfig(8, 700))


@tpu_only
def test_kernel_short_segments():
    rng = np.random.default_rng(2)
    x = np.round(np.cumsum(rng.normal(0, 8, (6, 520)), axis=-1)).astype(
        np.int16
    )
    nv = np.array([520, 1, 100, 0, 519, 512], np.int32)
    _compare(x, nv, RiceConfig(8, 520))


@tpu_only
def test_kernel_multi_block():
    rng = np.random.default_rng(3)
    x = np.round(np.cumsum(rng.normal(0, 10, (1500, 96)), axis=-1)).astype(
        np.int16
    )
    nv = np.full(1500, 96, np.int32)
    _compare(x, nv, RiceConfig(8, 96))


@tpu_only
def test_kernel_generic_filter():
    rng = np.random.default_rng(4)
    x = np.round(np.cumsum(rng.normal(0, 10, (4, 200)), axis=-1)).astype(
        np.int16
    )
    nv = np.full(4, 200, np.int32)
    _compare(x, nv, RiceConfig(8, 200, (1, -2, 1)))


@tpu_only
def test_roundtrip_through_both_kernels():
    """pallas encode -> pallas decode reproduces the input exactly."""
    import deltarice_tpu as drt

    rng = np.random.default_rng(5)
    x = np.round(np.cumsum(rng.normal(0, 10, (700,)), axis=-1)).astype(
        np.int16
    )
    cfg = drt.RiceConfig(8, 100)
    blob = drt.compress(x, cfg, method="pallas")
    out = drt.decompress(blob, cfg, backend="pallas")
    np.testing.assert_array_equal(out, x)
    # and the bytes are identical to the XLA path's bytes
    assert blob == drt.compress(x, cfg, method="segsum")


# --- half-rate emission (rate=2): slot per sample pair ------------------

def _halfrate_roundtrip(x, nvalid, cfg):
    """Encode at rate 2, re-encode flagged rows exactly, and compare the
    framed bytes to the XLA oracle's. Returns the flag count."""
    from deltarice_tpu.codec import (
        _reencode_bad_rows, frame_stream)
    from deltarice_tpu.ops.pack_pallas import pack_encode_pallas_bits

    mw = cfg.max_words(x.shape[1])
    w2, nw2, _nb, bad = pack_encode_pallas_bits(
        jnp.asarray(x), jnp.asarray(nvalid), cfg.k, mw, True, None, 2
    )
    nwn = np.asarray(nw2)
    wn = _reencode_bad_rows(np.asarray(w2), x, nvalid, bad, cfg, mw)
    w_x, n_x, _ = _encode_segments_xla(
        jnp.asarray(x), jnp.asarray(nvalid), cfg, mw, "segsum"
    )
    np.testing.assert_array_equal(nwn, np.asarray(n_x))
    np.testing.assert_array_equal(wn, np.asarray(w_x))
    return int(np.asarray(bad).sum())


@tpu_only
def test_halfrate_dense_walk_bytes_exact():
    """Dense walk data: few pairs double-emit; flagged rows re-encode and
    the result is byte-identical to the full-rate stream."""
    rng = np.random.default_rng(21)
    x = np.round(np.cumsum(rng.normal(0, 10, (64, 1000)), axis=-1)).astype(
        np.int16
    )
    nflag = _halfrate_roundtrip(x, np.full(64, 1000, np.int32),
                                RiceConfig(8, 1000))
    assert nflag < 32, f"dense data should rarely flag, got {nflag}/64"


@tpu_only
def test_halfrate_double_emit_flags_and_recovers():
    """Adjacent near-escape codewords force pairs to complete two words:
    the kernel must flag those segments (their staging is garbage) and
    the exact re-encode must restore byte equality."""
    rng = np.random.default_rng(22)
    x = np.round(np.cumsum(rng.normal(0, 10, (16, 1000)), axis=-1)).astype(
        np.int16
    )
    x[:8, 100::2] = 32000  # giant alternating deltas in half the rows
    x[:8, 101::2] = -32000
    nflag = _halfrate_roundtrip(x, np.full(16, 1000, np.int32),
                                RiceConfig(8, 1000))
    assert nflag >= 8, f"hostile rows must flag, got {nflag}"


@tpu_only
def test_halfrate_odd_length_and_short_segments():
    """Odd lengths share the last sample's pair slot with the tail home
    calculation; short nvalid freezes mid-pair."""
    rng = np.random.default_rng(23)
    x = np.round(np.cumsum(rng.normal(0, 10, (12, 777)), axis=-1)).astype(
        np.int16
    )
    nv = np.full(12, 777, np.int32)
    nv[5:] = [776, 775, 400, 401, 3, 1, 0]
    _halfrate_roundtrip(x, nv, RiceConfig(8, 777))


def test_rate_hint_regimes():
    """Host-side emission-rate estimate: dense walks get rate 2, escape-
    heavy/uniform data and non-delta filters stay at rate 1."""
    from deltarice_tpu.codec import _rate_hint

    rng = np.random.default_rng(24)
    dense = np.round(
        np.cumsum(rng.normal(0, 10, (32, 7000)), axis=-1)
    ).astype(np.int16)
    assert _rate_hint(dense, RiceConfig(8, 7000)) == 2
    uniform = rng.integers(-32768, 32768, (32, 7000)).astype(np.int16)
    assert _rate_hint(uniform, RiceConfig(8, 7000)) == 1
    # non-delta filters aren't estimated
    fir = RiceConfig(8, 7000, filt=(1, -2, 1))
    assert _rate_hint(dense, fir) == 1
