"""Per-chunk failure recovery: round-trip verification + host-side
re-dispatch (docs/Parallelism.md's failure story, now with code). Fault
injection corrupts the encoder's framed output for selected calls and
asserts the retry path repairs or reports it."""

import numpy as np
import pytest

import deltarice_tpu as drt
from deltarice_tpu import codec


def _chunks(n=5, shape=(4, 256), seed=0):
    rng = np.random.default_rng(seed)
    return [
        np.round(
            np.cumsum(rng.normal(0, 10, shape), axis=-1)
        ).astype(np.int16)
        for _ in range(n)
    ]


def _corrupting_frame_stream(fail_calls: set, real):
    """Wrap frame_stream to flip a payload bit on selected invocations."""
    count = {"n": 0}

    def wrapped(total, words, nwords):
        blob = bytearray(real(total, words, nwords))
        call = count["n"]
        count["n"] += 1
        if call in fail_calls and len(blob) > 8:
            blob[-1] ^= 0x40  # corrupt payload bits, keep headers intact
        return bytes(blob)

    return wrapped


def test_verify_passes_clean_batch():
    chunks = _chunks()
    cfg = drt.RiceConfig(8, 256)
    got = codec.compress_batch(chunks, cfg, verify=True)
    want = codec.compress_batch(chunks, cfg)
    assert got == want


def test_transient_fault_recovers_per_chunk(monkeypatch):
    chunks = _chunks()
    cfg = drt.RiceConfig(8, 256)
    want = codec.compress_batch(chunks, cfg)
    # batch framing calls frame_stream once per chunk: corrupt chunk 2 of
    # the first batch; the retry re-dispatch (call 5+) runs clean
    monkeypatch.setattr(
        codec, "frame_stream",
        _corrupting_frame_stream({2}, codec.frame_stream),
    )
    got = codec.compress_batch(chunks, cfg, verify=True)
    assert got == want
    for blob, x in zip(got, chunks):
        np.testing.assert_array_equal(
            codec.decompress(blob, cfg).reshape(x.shape), x
        )


def test_persistent_fault_raises(monkeypatch):
    chunks = _chunks(3)
    cfg = drt.RiceConfig(8, 256)
    monkeypatch.setattr(
        codec, "frame_stream",
        _corrupting_frame_stream(set(range(100)), codec.frame_stream),
    )
    with pytest.raises(RuntimeError, match="round-trip verification"):
        codec.compress_batch(chunks, cfg, verify=True, retries=2)


def test_write_dataset_verify_flag(tmp_path):
    h5py = pytest.importorskip("h5py")
    from deltarice_tpu import h5 as drh5

    x = np.vstack([c for c in _chunks(2, (4, 128), seed=3)])
    cfg = drt.RiceConfig(8, 128)
    with h5py.File(tmp_path / "t.h5", "w") as f:
        drh5.write_dataset(f, "d", x, cfg, chunks=(4, 128), verify=True)
    with h5py.File(tmp_path / "t.h5", "r") as f:
        np.testing.assert_array_equal(drh5.read_dataset(f["d"]), x)


def test_header_corruption_recovers(monkeypatch):
    """A fault that breaks a stream's framing (not just payload bits) must
    still be isolated to its chunk and repaired."""
    chunks = _chunks(4, (2, 128), seed=7)
    cfg = drt.RiceConfig(8, 128)
    want = codec.compress_batch(chunks, cfg)
    real = codec.frame_stream
    count = {"n": 0}

    def wrapped(total, words, nwords):
        blob = real(total, words, nwords)
        call = count["n"]
        count["n"] += 1
        if call == 1:
            return blob[:6]  # truncate: walk_headers will raise
        return blob

    monkeypatch.setattr(codec, "frame_stream", wrapped)
    got = codec.compress_batch(chunks, cfg, verify=True)
    assert got == want
