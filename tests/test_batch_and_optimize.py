"""Batched chunk codec, multihost pipeline (single-process), optimizer."""

import numpy as np
import pytest

import jax

import deltarice_tpu as drt
from deltarice_tpu.codec import compress_batch, decompress_batch
from deltarice_tpu import optimize as opt
from deltarice_tpu.models import get_profile


def _chunks(n=5, shape=(6, 200), seed=0):
    rng = np.random.default_rng(seed)
    return [
        np.round(np.cumsum(rng.normal(0, 10, shape), axis=-1)).astype(
            np.int16
        )
        for _ in range(n)
    ]


def test_compress_batch_matches_single():
    cfg = drt.RiceConfig(8, 200)
    chunks = _chunks()
    blobs = compress_batch(chunks, cfg)
    for blob, chunk in zip(blobs, chunks):
        assert blob == drt.compress(chunk, cfg)


def test_decompress_batch_roundtrip():
    cfg = drt.RiceConfig(8, 200)
    chunks = _chunks(seed=1)
    blobs = compress_batch(chunks, cfg)
    outs = decompress_batch(blobs, cfg)
    for out, chunk in zip(outs, chunks):
        np.testing.assert_array_equal(out, chunk.ravel())


def test_batch_rejects_mixed_sizes():
    cfg = drt.RiceConfig(8, 100)
    with pytest.raises(ValueError):
        compress_batch(
            [np.zeros(100, np.int16), np.zeros(200, np.int16)], cfg
        )


def test_multihost_single_process():
    from deltarice_tpu.parallel.multihost import encode_chunks_multihost
    from deltarice_tpu.parallel import chunk_mesh

    devs = jax.devices("cpu")
    if len(devs) < 4:
        pytest.skip("needs >= 4 cpu devices")
    mesh = chunk_mesh(devs[:4])
    rng = np.random.default_rng(2)
    batch = np.round(
        np.cumsum(rng.normal(0, 10, (6, 3, 128)), axis=-1)
    ).astype(np.int16)
    cfg = drt.RiceConfig(8, 128)
    blobs = encode_chunks_multihost(batch, cfg, mesh)
    assert len(blobs) == 6
    for c in range(6):
        assert blobs[c] == drt.compress(batch[c].ravel(), cfg)


def test_optimal_m_tracks_sigma():
    rng = np.random.default_rng(3)
    # larger sigma -> larger optimal M
    small = np.round(np.cumsum(rng.normal(0, 2, (8, 2000)), axis=-1))
    big = np.round(np.cumsum(rng.normal(0, 120, (8, 2000)), axis=-1))
    m_small = opt.optimal_m(small.astype(np.int16))
    m_big = opt.optimal_m(big.astype(np.int16))
    assert m_small < m_big


def test_expected_bits_predicts_ratio():
    p = get_profile("nab")
    x = p.synthetic(16, length=2000)
    cfg = drt.RiceConfig(8, 2000)
    bits = opt.expected_bits(x, 8)
    blob = drt.compress(x, cfg)
    actual_bits = len(blob) * 8 / x.size
    assert abs(actual_bits - bits) / bits < 0.05, (bits, actual_bits)


def test_batched_filter_costs_match_scalar_eval():
    """The one-dispatch neighborhood evaluation must agree with the scalar
    per-filter cost path (expected_bits) for every candidate."""
    import jax.numpy as jnp

    rng = np.random.default_rng(9)
    x = np.round(np.cumsum(rng.normal(0, 6, (4, 1500)), axis=-1)).astype(
        np.int16
    )
    cands = [(1, -1), (1, -2), (2, -1), (1, 0), (-1, 1)]
    batch = opt._filter_costs(jnp.asarray(x), cands, pad_to=9)
    for f, (k, bits) in zip(cands, batch):
        want = opt.expected_bits(x, 1 << k, f)
        assert abs(bits - want) < 1e-4, (f, bits, want)


def test_optimize_recovers_delta_on_random_walk():
    rng = np.random.default_rng(4)
    x = np.round(np.cumsum(rng.normal(0, 10, (4, 3000)), axis=-1)).astype(
        np.int16
    )
    cfg = opt.optimize(x, n_taps=2, span=1)
    assert cfg.filt == (1, -1)
    assert cfg.m in (8, 16)


def test_profiles_compress_near_published_ratio():
    # tuned generators: nab/noptrex land within ~1 point of published;
    # nedm is floor-bound at k+1 bits = 5/16 = 0.3125 (see profiles.py)
    tol = {"nab": 0.02, "noptrex": 0.02, "nedm": 0.05}
    for name in ("nab", "nedm", "noptrex"):
        p = get_profile(name)
        x = p.synthetic(8, length=4096)
        blob = drt.compress(x, drt.RiceConfig(p.rice_m, 4096))
        ratio = len(blob) / x.nbytes
        assert abs(ratio - p.published_ratio) < tol[name], (name, ratio)
