"""Byte-exactness against the reference C implementation (golden oracle).

Every case asserts all four directions: our bytes == reference bytes, our
decode of our bytes, reference decode of our bytes, our decode of reference
bytes. Covers the reference test matrix (/root/reference/tests/test.py) plus
the gaps SURVEY.md §4 calls out (escape-heavy + leftover + custom-filter
combinations, M sweep).
"""

import numpy as np
import pytest

import deltarice_tpu as drt
from deltarice_tpu.testing import ReferenceOracle, oracle_available

pytestmark = pytest.mark.skipif(
    not oracle_available(), reason="reference oracle not available"
)


@pytest.fixture(scope="module")
def oracle():
    return ReferenceOracle()


def check(oracle, x, cfg):
    if not oracle.compress_is_safe(np.asarray(x).size, cfg.waveform_length):
        pytest.skip("reference implementation would overflow its own buffers")
    cd = cfg.to_cd_values()
    ref = oracle.compress(x, cd)
    ours = drt.compress(x, cfg)
    assert ours == ref, f"compressed bytes differ (len {len(ours)} vs {len(ref)})"
    np.testing.assert_array_equal(drt.decompress(ours, cfg), x)
    np.testing.assert_array_equal(oracle.decompress(ours, cd), x)
    np.testing.assert_array_equal(drt.decompress(ref, cfg), x)


def smooth(rng, n, sigma=3.0):
    return np.round(np.cumsum(rng.normal(0, sigma, n))).astype(np.int16)


def test_default_opts_random(oracle):
    rng = np.random.default_rng(1)
    check(oracle, rng.integers(-32768, 32768, 2**16).astype(np.int16), drt.RiceConfig())


@pytest.mark.parametrize("m", [2, 4, 8, 16, 256, 32768])
def test_m_sweep(oracle, m):
    rng = np.random.default_rng(m)
    check(oracle, smooth(rng, 8192, 20.0), drt.RiceConfig(m, 1024))


def test_segmented(oracle):
    rng = np.random.default_rng(3)
    check(oracle, smooth(rng, 2**16), drt.RiceConfig(8, 1024))


# Cases where the reference's own undersized output malloc would overflow
# (tiny chunks / short leftovers, src/deltaRice.c:411-421) skip automatically
# via compress_is_safe; tiny-input round trips are covered oracle-free in
# test_codec.py.
@pytest.mark.parametrize("n", [64, 1023, 1025, 9000])
def test_leftover_segments(oracle, n):
    rng = np.random.default_rng(n)
    check(oracle, smooth(rng, n), drt.RiceConfig(8, 1024))


@pytest.mark.parametrize(
    "filt", [(1,), (1, -1, 1, -1), (2, -1), (1, -2, 1), (-1, 1)]
)
def test_custom_filters(oracle, filt):
    rng = np.random.default_rng(hash(filt) & 0xFFFF)
    check(oracle, smooth(rng, 4096), drt.RiceConfig(8, 512, filt))


def test_escape_heavy_leftover_custom_filter(oracle):
    # the combination SURVEY.md flags as untested in the reference
    rng = np.random.default_rng(7)
    x = rng.integers(-32768, 32768, 5000).astype(np.int16)
    check(oracle, x, drt.RiceConfig(8, 1024, (1, -1, 1, -1)))


def test_all_signed_values(oracle):
    check(oracle, np.arange(-32768, 32768, dtype=np.int16), drt.RiceConfig(8, 1024, (1,)))


def test_all_unsigned_values_type_punned(oracle):
    x = np.arange(0, 65536, dtype=np.uint16)
    cfg = drt.RiceConfig(8, 1024, (1,))
    ref = oracle.compress(x.view(np.int16), cfg.to_cd_values())
    ours = drt.compress(x, cfg)
    assert ours == ref
    np.testing.assert_array_equal(drt.decompress(ours, cfg).view(np.uint16), x)


def test_whole_chunk_single_segment(oracle):
    rng = np.random.default_rng(9)
    check(oracle, smooth(rng, 7000), drt.RiceConfig(8, -1))


def test_constant_and_extreme_inputs(oracle):
    cfg = drt.RiceConfig(8, 256)
    for x in [
        np.zeros(1000, np.int16),
        np.full(1000, -32768, np.int16),
        np.full(1000, 32767, np.int16),
        np.tile(np.array([-32768, 32767], np.int16), 500),
    ]:
        check(oracle, x, cfg)


def test_scatter_pack_method_matches(oracle):
    rng = np.random.default_rng(11)
    x = smooth(rng, 8192)
    cfg = drt.RiceConfig(8, 1024)
    assert drt.compress(x, cfg, method="scatter") == oracle.compress(x, cfg.to_cd_values())


def test_int32_input_type_punned(oracle):
    # "any other precision is cast to 16-bit": the filter sees raw bytes in
    # 2-byte units; round-trip restores the original bytes.
    rng = np.random.default_rng(13)
    x = rng.integers(-(2**30), 2**30, 3000).astype(np.int32)
    cfg = drt.RiceConfig(8, 1000)
    ours = drt.compress(x, cfg)
    assert ours == oracle.compress(x.view(np.int16), cfg.to_cd_values())
    np.testing.assert_array_equal(drt.decompress(ours, cfg).view(np.int32), x)
