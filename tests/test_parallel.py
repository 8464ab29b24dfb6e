"""Sharded chunk-parallel encode/decode over a virtual 8-device CPU mesh."""

import numpy as np
import pytest

import jax

import deltarice_tpu as drt
from deltarice_tpu.codec import frame_stream
from deltarice_tpu.parallel import (
    chunk_mesh,
    decode_chunks_sharded,
    encode_chunks_sharded,
    roundtrip_check_step,
)
from deltarice_tpu.parallel.sharded import put_sharded


def _cpu_mesh(n=8):
    devs = jax.devices("cpu")
    if len(devs) < n:
        pytest.skip(f"need {n} cpu devices, have {len(devs)}")
    return chunk_mesh(devs[:n])


def _chunk_batch(nchunks=8, nseg=4, length=256, seed=0):
    rng = np.random.default_rng(seed)
    x = np.round(
        np.cumsum(rng.normal(0, 10, (nchunks, nseg, length)), axis=-1)
    ).astype(np.int16)
    nvalid = np.full((nchunks, nseg), length, dtype=np.int32)
    return x, nvalid


def test_sharded_roundtrip_no_mismatch():
    mesh = _cpu_mesh()
    cfg = drt.RiceConfig(8, 256)
    x, nvalid = _chunk_batch()
    nvalid[-1, -1] = 100  # short leftover segment on the last device
    words, nwords, mism = roundtrip_check_step(
        put_sharded(x, mesh), put_sharded(nvalid, mesh), cfg, mesh,
        cfg.max_words(256),
    )
    assert int(mism) == 0


def test_sharded_bytes_match_single_device():
    """The framed stream produced from sharded outputs must be identical to
    the single-chip compress() result, chunk by chunk."""
    mesh = _cpu_mesh()
    length = 200
    cfg = drt.RiceConfig(8, length)
    x, nvalid = _chunk_batch(nchunks=8, nseg=3, length=length, seed=7)
    words, nwords = encode_chunks_sharded(
        put_sharded(x, mesh), put_sharded(nvalid, mesh), cfg, mesh,
        cfg.max_words(length),
    )
    words = np.asarray(words)
    nwords = np.asarray(nwords)
    for c in range(x.shape[0]):
        blob = frame_stream(3 * length, words[c], nwords[c])
        assert blob == drt.compress(x[c].ravel(), cfg)


def test_sharded_decode_matches_input():
    mesh = _cpu_mesh()
    length = 128
    cfg = drt.RiceConfig(4, length)
    x, nvalid = _chunk_batch(nchunks=16, nseg=2, length=length, seed=3)
    words, nwords = encode_chunks_sharded(
        put_sharded(x, mesh), put_sharded(nvalid, mesh), cfg, mesh,
        cfg.max_words(length),
    )
    out = decode_chunks_sharded(words, length, cfg, mesh)
    np.testing.assert_array_equal(np.asarray(out), x)


def test_sharded_decode_service_rate():
    """Reduced-service decode under the mesh (j_eff static): the XLA path
    is exact and returns all-clear flags; output matches the input."""
    mesh = _cpu_mesh()
    length = 128
    cfg = drt.RiceConfig(4, length)
    x, nvalid = _chunk_batch(nchunks=8, nseg=2, length=length, seed=5)
    words, nwords = encode_chunks_sharded(
        put_sharded(x, mesh), put_sharded(nvalid, mesh), cfg, mesh,
        cfg.max_words(length),
    )
    out, bad = decode_chunks_sharded(words, length, cfg, mesh, j_eff=3)
    assert not np.asarray(bad).any()
    np.testing.assert_array_equal(np.asarray(out), x)


def test_sharded_decode_service_rate_tpu():
    """The reduced-service Mosaic kernel inside shard_map on a real TPU
    mesh: escape-heavy chunks at J=2, flagged rows re-decoded exactly."""
    tpus = [d for d in jax.devices() if d.platform == "tpu"]
    if not tpus:
        pytest.skip("no TPU")
    from deltarice_tpu.codec import _redecode_bad_rows

    mesh = chunk_mesh(tpus[:1])
    length = 512
    cfg = drt.RiceConfig(8, length)
    rng = np.random.default_rng(7)
    x = rng.integers(-32768, 32768, (4, 8, length)).astype(np.int16)
    nvalid = np.full((4, 8), length, np.int32)
    words, nwords = encode_chunks_sharded(
        put_sharded(x, mesh), put_sharded(nvalid, mesh), cfg, mesh,
        cfg.max_words(length),
    )
    out, bad = decode_chunks_sharded(words, length, cfg, mesh, j_eff=2)
    w2 = np.asarray(words).reshape(4 * 8, -1)
    got = _redecode_bad_rows(
        np.asarray(out).reshape(4 * 8, length), np.asarray(bad).reshape(-1),
        w2, length, cfg,
    )
    np.testing.assert_array_equal(got.reshape(4, 8, length), x)


def test_sharded_pallas_on_tpu_mesh():
    """Single-device TPU mesh exercises the Mosaic kernels inside shard_map."""
    tpus = [d for d in jax.devices() if d.platform == "tpu"]
    if not tpus:
        pytest.skip("no TPU")
    mesh = chunk_mesh(tpus[:1])
    cfg = drt.RiceConfig(8, 256)
    x, nvalid = _chunk_batch(nchunks=2, nseg=4, length=256, seed=9)
    words, nwords, mism = roundtrip_check_step(
        put_sharded(x, mesh), put_sharded(nvalid, mesh), cfg, mesh,
        cfg.max_words(256),
    )
    assert int(mism) == 0
    # bytes equal the host codec's
    blob = frame_stream(4 * 256, np.asarray(words)[0], np.asarray(nwords)[0])
    assert blob == drt.compress(x[0].ravel(), cfg)
