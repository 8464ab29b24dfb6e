"""Self-contained codec tests (no oracle): round trips, config schema,
pre-filter semantics, frame-level properties."""

import numpy as np
import pytest

import deltarice_tpu as drt
from deltarice_tpu.config import RiceConfig, rice_k, max_codeword_bits
from deltarice_tpu.ops.prefilter import prefilter_encode, prefilter_decode
from deltarice_tpu.ops.rice import zigzag, unzigzag


def test_rice_k():
    assert rice_k(1) == 0
    assert rice_k(8) == 3
    assert rice_k(32768) == 15
    for bad in [0, -4, 3, 12, 1 << 16]:
        with pytest.raises(ValueError):
            rice_k(bad)


def test_cd_values_roundtrip():
    for cfg in [
        RiceConfig(),
        RiceConfig(16),
        RiceConfig(8, 1024),
        RiceConfig(8, 1024, (1,)),
        RiceConfig(4, 512, (1, -2, 1)),
        RiceConfig(8, 100, (-1, 1)),
    ]:
        assert RiceConfig.from_cd_values(cfg.to_cd_values()) == cfg
    # negative coefficients survive the u32 wire encoding
    cd = RiceConfig(8, 64, (1, -1, 1, -1)).to_cd_values()
    assert all(v >= 0 for v in cd)
    assert RiceConfig.from_cd_values(cd).filt == (1, -1, 1, -1)


def test_cd_values_default_schemas():
    assert RiceConfig().to_cd_values() == ()
    assert RiceConfig(16).to_cd_values() == (16,)
    assert RiceConfig(8, 1024).to_cd_values() == (8, 1024)
    assert RiceConfig.from_cd_values(()) == RiceConfig(8, -1, (1, -1))


def test_max_codeword_bits():
    assert max_codeword_bits(8) == 25   # escape dominates
    assert max_codeword_bits(1 << 13) == 21  # q <= 7, no escape reachable
    assert max_codeword_bits(1 << 15) == 17


def test_zigzag_all_values():
    x = np.arange(-32768, 32768, dtype=np.int16)
    u = np.asarray(zigzag(x))
    assert u.min() == 0 and u.max() == 65535
    assert len(np.unique(u)) == 65536
    np.testing.assert_array_equal(np.asarray(unzigzag(u)), x)


def test_delta_prefilter_wraparound():
    x = np.array([-32768, 32767, -32768, 0, 32767], dtype=np.int16)
    d = np.asarray(prefilter_encode(x))
    # differences wrap mod 2**16 like C short arithmetic
    expect = np.array([-32768, 32767 - (-32768), 0, 0, 0], dtype=np.int64)
    expect[2] = -32768 - 32767
    expect[3] = 0 - (-32768)
    expect[4] = 32767 - 0
    np.testing.assert_array_equal(d.astype(np.int64), ((expect + 2**15) % 2**16) - 2**15)
    np.testing.assert_array_equal(np.asarray(prefilter_decode(d)), x)


@pytest.mark.parametrize("filt", [(1, -1), (1,), (1, -1, 1, -1), (-1, 2), (1, -2, 1)])
def test_prefilter_roundtrip_unit_leading(filt):
    if abs(filt[0]) != 1:
        pytest.skip("non-unit leading coefficient is lossy by design")
    rng = np.random.default_rng(42)
    x = rng.integers(-32768, 32768, (3, 500)).astype(np.int16)
    d = np.asarray(prefilter_encode(x, filt))
    y = np.asarray(prefilter_decode(d, filt))
    np.testing.assert_array_equal(y, x)


def test_compress_rejects_odd_bytes():
    with pytest.raises(ValueError):
        drt.compress(b"\x01\x02\x03")


def test_roundtrip_various_shapes():
    rng = np.random.default_rng(0)
    cfg = drt.RiceConfig(8, 700)
    for n in [1, 2, 699, 700, 701, 1400, 10000]:
        x = np.round(np.cumsum(rng.normal(0, 5, n))).astype(np.int16)
        np.testing.assert_array_equal(drt.decompress(drt.compress(x, cfg), cfg), x)


def test_frame_layout():
    x = np.zeros(100, dtype=np.int16)
    cfg = drt.RiceConfig(8, 50)
    buf = np.frombuffer(drt.compress(x, cfg), dtype="<u4")
    assert buf[0] == 100  # total samples header
    n0 = int(buf[1])      # first segment word count
    assert buf[1 + n0 + 1] == buf[1]  # two identical segments
    # all-zero input with M=8: each sample is 0 -> q=0,r=0 -> 4 bits
    assert n0 == (50 * 4 + 31) // 32


def test_compression_ratio_gaussian_sigma10():
    # README example distribution: sigma=10 Gaussian, delta filter, M=8.
    rng = np.random.default_rng(5)
    x = rng.normal(0, 10, (100, 7000)).astype(np.int16)
    out = drt.compress(x, drt.RiceConfig(8, 7000))
    ratio = len(out) / x.nbytes
    assert ratio < 0.45, ratio


def test_decompress_truncated_stream_raises():
    x = np.arange(1000, dtype=np.int16)
    cfg = drt.RiceConfig(8, 100)
    blob = drt.compress(x, cfg)
    with pytest.raises(ValueError):
        drt.decompress(blob[: len(blob) // 4], cfg)
