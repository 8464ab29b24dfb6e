"""Chunk-level Delta-Rice codec: segmentation, device encode/decode, and the
framed byte-stream layout.

Frame layout (frozen; ``writeWholeCompressedByteString`` /
``readWholeCompressedByteString``, ``/root/reference/src/deltaRice.c:383,301``):

    u32 totalSamples | { u32 nWords_i | u32 words_i[nWords_i] } x numSegments

with ``numSegments = ceil(totalSamples / L)`` and the last segment holding the
leftover samples; ``L == -1`` means one segment spanning the chunk. Words are
little-endian uint32 on disk.

TPU-first split of responsibilities:

* device (jitted): pre-filter, zigzag, codeword math, bit packing/unpacking —
  everything O(samples), batched over the segment axis (the reference's
  OpenMP ``parallel for`` becomes the vectorized leading axis).
* host (numpy): the variable-length framing — a ragged gather/scatter at
  memcpy speed, the analog of the reference's serial compaction memcpy
  (``src/deltaRice.c:427-432``) and header walk (``:319-325``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .config import RiceConfig
from .ops.prefilter import prefilter_decode, prefilter_encode
from .ops.rice import codeword_lengths_values, unzigzag, zigzag
from .ops.pack_xla import pack_bits, unpack_bits
from .ops.unpack_pallas import unpack_decode_pallas
from .utils.cache import enable_persistent_cache

_WORD_BUCKET = 256  # decode pads segment word counts up to a multiple of this
                    # to bound the number of distinct compiled shapes


@functools.partial(jax.jit, static_argnums=(2, 3, 4))
def _encode_segments_xla(x: jnp.ndarray, nvalid: jnp.ndarray,
                         cfg: RiceConfig, max_words: int,
                         method: str = "segsum"):
    """Pure-XLA encode path (prefix-sum + boundary-gather packing).

    Shape-agnostic and correct everywhere; on TPU its gathers are slow, so
    it serves as the CPU/mesh path and the kernel's correctness oracle.
    """
    d = prefilter_encode(x, cfg.filt)
    u = zigzag(d)
    lens, vals = codeword_lengths_values(u, cfg.k)
    mask = jnp.arange(x.shape[-1], dtype=jnp.int32)[None, :] < nvalid[:, None]
    lens = jnp.where(mask, lens, 0)
    return pack_bits(lens, vals, max_words, method)


def encode_segments(x: jnp.ndarray, nvalid: jnp.ndarray, cfg: RiceConfig,
                    max_words: int, method: str = "auto"):
    """Encode padded segments.

    Args:
      x: (num_segments, L) int16, zero-padded past each segment's nvalid.
      nvalid: (num_segments,) int32 valid sample counts.
      cfg: codec parameters (static).
      max_words: static packed-words bound, >= cfg.max_words(L).
      method: "pallas" (fused TPU kernel), "segsum"/"scatter" (XLA), or
        "auto" (pallas on TPU, segsum elsewhere).

    Returns:
      (words (num_segments, max_words) uint32, nwords (num_segments,) int32)
    """
    enable_persistent_cache()  # first TPU compile costs minutes; persist it
    if method == "auto":
        method = "pallas" if jax.default_backend() == "tpu" else "segsum"
    if method == "pallas":
        from .ops.pack_pallas import pack_encode_pallas

        if cfg.is_delta:
            return pack_encode_pallas(x, nvalid, cfg.k, max_words, True)
        d = prefilter_encode(x, cfg.filt)
        return pack_encode_pallas(d, nvalid, cfg.k, max_words, False)
    return _encode_segments_xla(x, nvalid, cfg, max_words, method)


@functools.partial(jax.jit, static_argnums=(1, 2))
def _decode_segments_scan(words: jnp.ndarray, n_samples: int, cfg: RiceConfig):
    """Reference XLA path: per-sample ``lax.scan`` bit cursor (slow on TPU
    but shape-agnostic; used on CPU and as the kernel's correctness
    oracle)."""
    u = unpack_bits(words, n_samples, cfg.k)
    return prefilter_decode(unzigzag(u), cfg.filt)


def decode_segments(words: jnp.ndarray, n_samples: int, cfg: RiceConfig,
                    backend: str = "auto"):
    """Decode per-segment word streams back to int16 samples.

    words: (num_segments, W) uint32 with at least one zero pad word per row.
    Returns (num_segments, n_samples) int16 (tail of short segments is
    garbage; callers slice by true counts).

    backend: "pallas" (word-synchronous TPU kernel; its W-chunked grid
    bounds VMEM by construction for any stream length), "scan" (XLA
    per-sample scan), or "auto" (pallas on TPU, scan elsewhere).
    """
    enable_persistent_cache()  # first TPU compile costs minutes; persist it
    if backend == "auto":
        backend = "pallas" if jax.default_backend() == "tpu" else "scan"
    if backend == "pallas":
        out = unpack_decode_pallas(words, n_samples, cfg.k, cfg.is_delta)
        if cfg.is_delta:
            return out
        return prefilter_decode(out, cfg.filt)
    return _decode_segments_scan(words, n_samples, cfg)


def _segment_layout(total: int, cfg: RiceConfig):
    nseg, length, leftover = cfg.segments(total)
    nvalid = np.full(nseg, length, dtype=np.int32)
    if leftover:
        nvalid[-1] = leftover
    return nseg, length, nvalid


def compress(data, cfg: RiceConfig = RiceConfig(), method: str = "auto") -> bytes:
    """Compress one chunk of int16 samples to the framed byte stream.

    ``data`` may be an int16 array, any 2-byte-item array (viewed as int16,
    matching the filter's type punning), or raw bytes of even length.
    """
    x = as_int16(data).ravel()
    total = x.size
    if total == 0:  # header-only stream, matching the native C codec
        return np.zeros(1, dtype="<u4").tobytes()
    nseg, length, nvalid = _segment_layout(total, cfg)
    padded = np.zeros((nseg, length), dtype=np.int16)
    padded.ravel()[:total] = x
    words, nwords = encode_segments(
        jnp.asarray(padded), jnp.asarray(nvalid), cfg, cfg.max_words(length), method
    )
    # device->host moves ~actual-compressed bytes, not the 25-bit worst
    # case: fetch the (tiny) word counts first, then slice on device
    nw = np.asarray(nwords)
    w = max(int(nw.max(initial=0)), 1)
    return frame_stream(total, np.asarray(words[:, :w]), nw)


def compress_batch(chunks, cfg: RiceConfig = RiceConfig(),
                   method: str = "auto", verify: bool = False,
                   retries: int = 2) -> list[bytes]:
    """Compress many equal-sized chunks in ONE device call.

    The per-chunk :func:`compress` pays one kernel dispatch per chunk;
    batching keeps the TPU busy across a whole dataset's chunks (the
    reference's "filter called once per chunk" control flow inverted). All
    chunks must have the same sample count (HDF5 chunks always do — edge
    chunks are stored full-size).

    With ``verify=True`` every stream is decoded back on device and
    compared to its input; chunks that fail re-dispatch individually up to
    ``retries`` times (chunks are independent bitstreams, so recovery is
    per-chunk re-dispatch — the failure-handling the reference lacks: its
    filter returns -1 and HDF5 aborts the whole I/O operation,
    ``/root/reference/src/deltaRice.c:474-488``). Persistent failure
    raises ``RuntimeError``.
    """
    handle = compress_batch_dispatch(chunks, cfg, method)
    return compress_batch_collect(handle, cfg, method, verify, retries)


def compress_batch_dispatch(chunks, cfg: RiceConfig = RiceConfig(),
                            method: str = "auto"):
    """Queue the device encode of a chunk batch and return a handle.

    Together with :func:`compress_batch_collect` this splits
    :func:`compress_batch` at the device boundary so callers can overlap
    one window's host-side framing + file I/O with the next window's
    device encode (JAX dispatch is asynchronous; the handle holds
    device-resident arrays). ``collect(dispatch(x)) == compress_batch(x)``
    byte-for-byte.
    """
    arrs = [as_int16(c).ravel() for c in chunks]
    if not arrs:
        return (arrs, 0, None, None)
    total = arrs[0].size
    if any(a.size != total for a in arrs):
        raise ValueError("compress_batch requires equal-sized chunks")
    if total == 0:  # header-only streams, matching compress()
        return (arrs, 0, None, None)
    nseg, length, nvalid = _segment_layout(total, cfg)
    nchunks = len(arrs)
    padded = np.zeros((nchunks, nseg, length), dtype=np.int16)
    padded.reshape(nchunks, -1)[:, :total] = np.stack(arrs)
    words, nwords = encode_segments(
        jnp.asarray(padded.reshape(nchunks * nseg, length)),
        jnp.asarray(np.tile(nvalid, nchunks)),
        cfg, cfg.max_words(length), method,
    )
    return (arrs, total, words, nwords)


def compress_batch_collect(handle, cfg: RiceConfig = RiceConfig(),
                           method: str = "auto", verify: bool = False,
                           retries: int = 2) -> list[bytes]:
    """Fetch + frame the streams of a :func:`compress_batch_dispatch`."""
    arrs, total, words, nwords = handle
    if not arrs:
        return []
    if total == 0:
        return [np.zeros(1, dtype="<u4").tobytes() for _ in arrs]
    nchunks = len(arrs)
    nseg = _segment_layout(total, cfg)[0]
    # fetch word counts first, then move only ~compressed-size bytes D2H
    nwords = np.asarray(nwords).reshape(nchunks, nseg)
    w = max(int(nwords.max(initial=0)), 1)
    words = np.asarray(words[:, :w]).reshape(nchunks, nseg, -1)
    streams = [
        frame_stream(total, words[c], nwords[c]) for c in range(nchunks)
    ]
    if verify:
        streams = _verify_retry(arrs, streams, cfg, method, retries)
    return streams


def _verify_retry(arrs, streams, cfg: RiceConfig, method: str,
                  retries: int) -> list[bytes]:
    """Round-trip-check every stream; re-dispatch failing chunks.

    One batched decode checks everything; only failing chunks pay the
    per-chunk retry path.
    """
    def bad_indices(idxs, blobs):
        try:
            decoded = decompress_batch(blobs, cfg)
        except ValueError:
            # a corrupted header poisons the whole batch decode; fall back
            # to per-stream checks so only the broken chunk retries
            decoded = []
            for b in blobs:
                try:
                    decoded.append(decompress(b, cfg))
                except ValueError:
                    decoded.append(None)
        return [
            i for i, out in zip(idxs, decoded)
            if out is None or not np.array_equal(out, arrs[i])
        ]

    bad = bad_indices(range(len(streams)), streams)
    for _ in range(max(retries, 0)):
        if not bad:
            break
        for i in bad:
            streams[i] = compress(arrs[i], cfg, method)
        bad = bad_indices(bad, [streams[i] for i in bad])
    if bad:
        raise RuntimeError(
            f"chunks {bad} failed round-trip verification after "
            f"{retries} retries"
        )
    return streams


def decompress_batch(streams, cfg: RiceConfig = RiceConfig(),
                     backend: str = "auto") -> list[np.ndarray]:
    """Decompress many chunks' framed streams in one device call per
    word-count bucket.

    All streams must describe the same sample count (uniform chunks).
    Chunks are grouped by their padded word width so one escape-heavy
    chunk only inflates transfer and compute for its own bucket, not the
    whole batch."""
    return decompress_batch_collect(
        decompress_batch_dispatch(streams, cfg, backend)
    )


def decompress_batch_dispatch(streams, cfg: RiceConfig = RiceConfig(),
                              backend: str = "auto"):
    """Queue the device decode of a stream batch and return a handle.

    The host side (header walk, ragged gather) runs here and each
    word-width bucket's decode is dispatched; the returned handle holds
    device-resident arrays that :func:`decompress_batch_collect` fetches.
    Splitting at the device boundary lets callers overlap one window's
    device->host copy with the next window's file reads + decode
    (JAX dispatch is asynchronous).
    """
    streams = list(streams)
    if not streams:
        return (0, 0, [])
    bufs = [np.frombuffer(memoryview(s), dtype="<u4") for s in streams]
    if any(b.size == 0 for b in bufs):
        raise ValueError("truncated Delta-Rice stream")
    total = int(bufs[0][0])
    if any(int(b[0]) != total for b in bufs):
        raise ValueError("decompress_batch requires equal-sized chunks")
    if total == 0:
        return (len(bufs), 0, [])
    nseg, length, _ = _segment_layout(total, cfg)
    by_bucket: dict[int, list[int]] = {}
    per_chunk = []
    for i, buf in enumerate(bufs):
        counts, starts = walk_headers(buf, nseg)
        per_chunk.append((buf, counts, starts))
        bucket = -(-(int(counts.max(initial=0)) + 1) // _WORD_BUCKET)
        by_bucket.setdefault(bucket * _WORD_BUCKET, []).append(i)
    pending = []
    for bucket, idxs in by_bucket.items():
        words = np.zeros((len(idxs), nseg, bucket), dtype=np.uint32)
        for j, i in enumerate(idxs):
            buf, counts, starts = per_chunk[i]
            words[j] = gather_segments(buf, counts, starts, bucket)
        dec = decode_segments(
            jnp.asarray(words.reshape(-1, bucket)), length, cfg, backend
        )
        pending.append((idxs, dec, nseg * length))
    return (len(bufs), total, pending)


def decompress_batch_collect(handle) -> list[np.ndarray]:
    """Fetch the arrays of a :func:`decompress_batch_dispatch`."""
    n, total, pending = handle
    if n == 0:
        return []
    if total == 0:
        return [np.zeros(0, dtype=np.int16) for _ in range(n)]
    out: list[np.ndarray | None] = [None] * n
    for idxs, dec, flat in pending:
        dec = np.asarray(dec).reshape(len(idxs), flat)
        for j, i in enumerate(idxs):
            out[i] = dec[j, :total].copy()
    return out


def decompress(stream, cfg: RiceConfig = RiceConfig(),
               backend: str = "auto") -> np.ndarray:
    """Decompress a framed byte stream back to a flat int16 array."""
    buf = np.frombuffer(memoryview(stream), dtype="<u4")
    if buf.size == 0:
        raise ValueError("truncated Delta-Rice stream")
    total = int(buf[0])
    if total == 0:
        return np.zeros(0, dtype=np.int16)
    nseg, length, _ = _segment_layout(total, cfg)
    counts, starts = walk_headers(buf, nseg)
    words = gather_segments(buf, counts, starts)
    out = decode_segments(jnp.asarray(words), length, cfg, backend)
    return np.asarray(out).ravel()[:total].copy()


def as_int16(data) -> np.ndarray:
    """View input as int16 samples (the filter compresses raw bytes in
    2-byte units regardless of the declared dtype)."""
    if isinstance(data, (bytes, bytearray, memoryview)):
        arr = np.frombuffer(data, dtype=np.uint8)
        if arr.size % 2:
            raise ValueError(f"input size not divisible by two: {arr.size}")
        return arr.view(np.int16)
    arr = np.asarray(data)
    if arr.dtype.itemsize == 2:
        return arr.view(np.int16)
    raw = arr.tobytes()
    if len(raw) % 2:
        raise ValueError(f"input size not divisible by two: {len(raw)}")
    return np.frombuffer(raw, dtype=np.int16)


def frame_stream(total: int, words: np.ndarray, nwords: np.ndarray) -> bytes:
    """Assemble the framed chunk from padded per-segment words (host side)."""
    counts = nwords.astype(np.int64)
    nseg = counts.shape[0]
    word_start = np.zeros(nseg + 1, dtype=np.int64)
    np.cumsum(counts, out=word_start[1:])
    total_words = int(word_start[-1])
    out = np.empty(1 + nseg + total_words, dtype="<u4")
    out[0] = total
    pos = 1 + np.arange(nseg, dtype=np.int64) + word_start[:-1]
    out[pos] = counts
    seg_of = np.repeat(np.arange(nseg, dtype=np.int64), counts)
    within = np.arange(total_words, dtype=np.int64) - np.repeat(word_start[:-1], counts)
    out[np.repeat(pos + 1, counts) + within] = words[seg_of, within]
    return out.tobytes()


def walk_headers(buf: np.ndarray, nseg: int):
    """Serial header walk: per-segment (word count, first-word offset).

    Mirrors the reference's start-location scan (``src/deltaRice.c:319-325``);
    each segment's length header can only be found after the previous one.
    Runs in the native C library when built (many-thousand-chunk reads pay
    this walk serially), with a numpy fallback.
    """
    from .native import codec_lib

    counts = np.empty(nseg, dtype=np.int64)
    starts = np.empty(nseg, dtype=np.int64)
    lib = codec_lib()
    if lib is not None:
        buf = np.ascontiguousarray(buf)
        rc = lib.dr_walk_headers(
            buf.ctypes.data, buf.size, nseg,
            counts.ctypes.data, starts.ctypes.data,
        )
        if rc != 0:
            raise ValueError("truncated Delta-Rice stream")
        return counts, starts
    pos = 1
    for i in range(nseg):
        if pos >= buf.size:
            raise ValueError("truncated Delta-Rice stream")
        starts[i] = pos
        c = int(buf[pos])
        counts[i] = c
        pos += c + 1
    if pos > buf.size:
        raise ValueError("truncated Delta-Rice stream")
    return counts, starts


def gather_segments(buf: np.ndarray, counts: np.ndarray, starts: np.ndarray,
                    bucket: int = _WORD_BUCKET) -> np.ndarray:
    """Scatter the ragged per-segment words into a padded dense matrix
    (native C + OpenMP when built, numpy fallback)."""
    from .native import codec_lib

    nseg = counts.shape[0]
    maxw = int(counts.max(initial=0)) + 1  # +1 pad word for the 64-bit window
    maxw = -(-maxw // bucket) * bucket
    words = np.zeros((nseg, maxw), dtype=np.uint32)
    lib = codec_lib()
    if lib is not None:
        buf = np.ascontiguousarray(buf)
        counts = np.ascontiguousarray(counts, dtype=np.int64)
        starts = np.ascontiguousarray(starts, dtype=np.int64)
        lib.dr_gather_rows(
            buf.ctypes.data, nseg, counts.ctypes.data, starts.ctypes.data,
            maxw, words.ctypes.data,
        )
        return words
    seg_of = np.repeat(np.arange(nseg, dtype=np.int64), counts)
    within = np.arange(int(counts.sum()), dtype=np.int64) - np.repeat(
        np.cumsum(counts) - counts, counts
    )
    words[seg_of, within] = buf[np.repeat(starts + 1, counts) + within]
    return words
