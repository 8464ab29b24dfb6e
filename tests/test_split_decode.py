"""Speculative split decode vs the serial kernel / scan oracle.

The split decode (:mod:`deltarice_tpu.ops.split_decode`) cuts each long
segment's word stream into P speculative sub-streams and proves the
speculation with junction phase checks (equality IS correctness — see
the module docstring). These tests assert byte-exactness on every
regime, that the production router engages it for the long-segment
geometries, and that the one adversarial case Rice cannot
self-synchronize on (a periodic stream entered off-lattice) FLAGS and
recovers through the exact re-decode — the speculate/flag/re-do
contract. TPU-only: the kernels target Mosaic.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deltarice_tpu.codec import (
    _decode_segments_scan,
    _segment_layout,
    compress,
    decompress,
    gather_segments,
    walk_headers,
)
from deltarice_tpu.config import RiceConfig
from deltarice_tpu.ops.split_decode import (
    decode_split_parts,
    unpack_decode_split,
)

tpu_only = pytest.mark.skipif(
    jax.default_backend() != "tpu", reason="needs a TPU for the Mosaic kernel"
)


def _streams(x, cfg, method="segsum"):
    blob = compress(x, cfg, method=method)
    buf = np.frombuffer(blob, dtype="<u4")
    nseg, length, nvalid = _segment_layout(x.size, cfg)
    counts, starts = walk_headers(buf, nseg)
    words = gather_segments(buf, counts, starts)
    return words, counts, nvalid, length


def _split_exact(name, x, cfg, parts, expect_flags=False):
    words, counts, nvalid, length = _streams(x, cfg)
    out, bad = unpack_decode_split(
        jnp.asarray(words), counts, length, cfg.k, cfg.is_delta, parts,
        nvalid,
    )
    bad = np.asarray(bad)
    if expect_flags:
        assert bad.any(), f"{name}: adversarial stream must flag"
        return
    assert not bad.any(), f"{name}: unexpected flags"
    ref = np.asarray(_decode_segments_scan(jnp.asarray(words), length, cfg))
    got = np.asarray(out)
    for i, nv in enumerate(nvalid):
        np.testing.assert_array_equal(got[i, :nv], ref[i, :nv], err_msg=name)


@tpu_only
@pytest.mark.parametrize("k,sigma,parts", [(3, 8.0, 4), (4, 16.0, 8),
                                           (1, 1.5, 4)])
def test_split_matches_serial_walk(k, sigma, parts):
    rng = np.random.default_rng(k)
    x = np.cumsum(rng.normal(0, sigma, (8, 30000)).round(), -1).astype(
        np.int16
    )
    _split_exact(f"walk k{k}", x, RiceConfig(1 << k, 30000), parts)


@tpu_only
@pytest.mark.slow
def test_split_escape_heavy_syncs_with_wide_halo():
    # escape streams self-synchronize slowly; the adaptive halo (sized
    # from the header-known codeword rate) keeps junctions exact
    rng = np.random.default_rng(0)
    x = rng.integers(-32768, 32768, (8, 30000)).astype(np.int16)
    _split_exact("uniform", x, RiceConfig(8, 30000), 16)


@tpu_only
def test_split_leftover_segment():
    rng = np.random.default_rng(1)
    x = np.cumsum(rng.normal(0, 8, (1, 100000)).round(), -1).astype(
        np.int16
    )[:, :97531].ravel()
    _split_exact("leftover", x, RiceConfig(8, 25000), 4)


@tpu_only
def test_split_constant_data():
    x = np.zeros((8, 30000), np.int16)
    _split_exact("zeros", x, RiceConfig(8, 30000), 4)


def _never_sync_data(nseg, length):
    """Stream that defeats Rice self-synchronization at k=1.

    data = 1, 0, -1, -2, ... (wrapping): the first codeword is 3 bits
    ('011'), every later one the 2-bit '11' — so true codeword
    boundaries sit on ODD bit offsets while each sub-block's
    speculation starts at an EVEN one (bit 0 of a word) and parses the
    all-ones stream self-consistently off-lattice forever. The junction
    check must catch it (exit phases are odd, speculated entries even).
    """
    x = (1 - np.arange(length, dtype=np.int64)).astype(np.int16)
    return np.broadcast_to(x, (nseg, length)).copy()


@tpu_only
def test_split_adversarial_never_sync_flags():
    x = _never_sync_data(8, 30000)
    _split_exact("never-sync", x, RiceConfig(2, 30000), 4,
                 expect_flags=True)


@tpu_only
def test_split_adversarial_recovers_through_decompress(monkeypatch):
    # end to end with the router force-enabled: the flagged segments
    # re-decode exactly, so decompress is byte-correct even on the
    # adversarial stream
    monkeypatch.setenv("DELTARICE_TPU_SPLIT_DECODE", "1")
    x = _never_sync_data(2, 120000)
    cfg = RiceConfig(2, 120000)
    blob = compress(x, cfg, method="segsum")
    out = decompress(blob, cfg).reshape(x.shape)
    np.testing.assert_array_equal(out, x)


def test_split_router_choices():
    # production router: split engages exactly where it pays (pure
    # host-side logic, runs on any backend)
    assert decode_split_parts(256, 80640, 3) > 1        # NOPTREX
    assert decode_split_parts(1024, 15700, 4) > 1       # nEDM
    assert decode_split_parts(1024, 1408, 3) == 1       # Nab: packed
    assert decode_split_parts(1024, 5632, 3, 2) == 1    # escape + svc 2
    assert decode_split_parts(1024, 2990, 1, 3) == 1    # nab_m2
    assert decode_split_parts(8, 640, 3) == 1           # short streams
