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
from .ops.unpack_pallas import codewords_per_word, unpack_decode_pallas
from .utils.cache import enable_persistent_cache

_WORD_BUCKET = 256  # decode pads segment word counts up to a multiple of this
                    # to bound the number of distinct compiled shapes


@functools.partial(jax.jit, static_argnums=(2, 3, 4, 6))
def _encode_segments_xla(x: jnp.ndarray, nvalid: jnp.ndarray,
                         cfg: RiceConfig, max_words: int,
                         method: str = "segsum", prev0=None,
                         prefiltered: bool = False):
    """Pure-XLA encode path (prefix-sum + boundary-gather packing).

    Shape-agnostic and correct everywhere; on TPU its gathers are slow, so
    it serves as the CPU/mesh path and the kernel's correctness oracle.
    Returns (words, nwords, nbits).
    """
    d = x.astype(jnp.int16) if prefiltered else prefilter_encode(
        x, cfg.filt, prev0
    )
    u = zigzag(d)
    lens, vals = codeword_lengths_values(u, cfg.k)
    mask = jnp.arange(x.shape[-1], dtype=jnp.int32)[None, :] < nvalid[:, None]
    lens = jnp.where(mask, lens, 0)
    words, nwords = pack_bits(lens, vals, max_words, method)
    return words, nwords, jnp.sum(lens, axis=-1)


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
    words, nwords, _ = encode_segments_bits(x, nvalid, cfg, max_words,
                                            method)
    return words, nwords


def encode_segments_bits(x: jnp.ndarray, nvalid: jnp.ndarray,
                         cfg: RiceConfig, max_words: int,
                         method: str = "auto", prev0=None,
                         prefiltered: bool = False):
    """:func:`encode_segments` plus exact per-stream bit counts and an
    optional initial delta state — what sub-block-split encoding needs
    (streams concatenate at bit offsets; delta chains continue across
    blocks). ``prefiltered`` skips the pre-filter (the generic-FIR split
    path filters with a halo before splitting). Returns
    (words, nwords, nbits)."""
    enable_persistent_cache()  # first TPU compile costs minutes; persist it
    if method == "auto":
        method = "pallas" if jax.default_backend() == "tpu" else "segsum"
    if method == "pallas":
        from .ops.pack_pallas import pack_encode_pallas_bits

        if prefiltered:
            return pack_encode_pallas_bits(x, nvalid, cfg.k, max_words,
                                           False)
        if cfg.is_delta:
            return pack_encode_pallas_bits(x, nvalid, cfg.k, max_words,
                                           True, prev0)
        d = prefilter_encode(x, cfg.filt, prev0)
        return pack_encode_pallas_bits(d, nvalid, cfg.k, max_words, False)
    return _encode_segments_xla(x, nvalid, cfg, max_words, method, prev0,
                                prefiltered)


@functools.partial(jax.jit, static_argnums=(1, 2))
def _decode_segments_scan(words: jnp.ndarray, n_samples: int, cfg: RiceConfig):
    """Reference XLA path: per-sample ``lax.scan`` bit cursor (slow on TPU
    but shape-agnostic; used on CPU and as the kernel's correctness
    oracle)."""
    u = unpack_bits(words, n_samples, cfg.k)
    return prefilter_decode(unzigzag(u), cfg.filt)


def _service_hint(counts, nvalid, k: int) -> int | None:
    """Decode service rate (codeword decodes per word) from header stats.

    The stream's headers give each segment's word count, hence its mean
    codeword starts per word. Escape-heavy or mismatched-M streams average
    ~1.3-2.4 starts/word against static bounds of 8-16; decoding at a
    service rate sized to the mean (x1.3 margin + 1, so transient bursts
    ride the kernel's lookback window instead of flagging) cuts kernel
    work and staging traffic by the same factor. Returns None when the
    bound itself is (near) optimal — dense-start streams like matched-M
    Gaussian data.
    """
    j_max = codewords_per_word(k)
    c = np.maximum(np.asarray(counts, dtype=np.float64), 1.0)
    nv = np.asarray(nvalid, dtype=np.float64)
    spw = nv / c  # per-segment mean codeword starts per word
    if spw.size == 0:
        return None
    hi = float(np.max(spw))
    # a few dense segments inside an escape-heavy dispatch must not
    # forfeit the whole batch's reduced rate: when the top 1% of
    # segments would force a >= 2x higher service rate than the rest
    # need, size J for the 99th percentile — the outliers overrun the
    # lookback window, get lag-flagged, and re-decode exactly (the same
    # guarantee that makes the reduced rate safe at all)
    q99 = float(np.quantile(spw, 0.99))
    need = q99 if hi > 2.0 * q99 else hi
    # the header means are EXACT totals, so the lag random walk has
    # positive drift whenever J > need and the lookback window absorbs
    # its excursions: a thin absolute margin suffices (measured on Nab
    # walk data, need 5.84: J=6 decodes with zero flags at 1.33x the
    # full-unroll rate; J=5, below the arrival rate, floods flags).
    # Every distinct J compiles its own kernel (minutes through a
    # remote-compile relay), so J rounds up into a short ladder instead
    # of ranging past 8.
    need += 0.15
    for j in (2, 3, 4, 5, 6, 7, 8, 12):
        if j >= need:
            return j if j < j_max else None
    return None


def _rate_hint(x: np.ndarray, cfg: RiceConfig,
               sub_length: int | None = None) -> int:
    """Encode emission rate (samples per staging slot) from a host-side
    subsample — the encode-side mirror of :func:`_service_hint`.

    At rate R the pallas encoder stages one slot per R consecutive
    samples (1/R the staging/placement work); a slot overruns only when
    its R codewords complete two or more words, which needs a >= 33-bit
    span AND an adverse bit phase. The kernel flags overrunning
    segments and the caller re-encodes them exactly at rate 1 — this
    hint just keeps the expected flag fraction small. The estimate is a
    cheap numpy pass on <= 64 rows x 4096 consecutive samples; the
    phase-averaged multi-emit probability per R-span is
    E[max(span_R - 32, 0)]/32 (spans past 64 bits emit three times and
    are still counted once — the flag fires either way).
    """
    if not cfg.is_delta or x.ndim != 2 or x.shape[1] < 8:
        return 1
    from .ops.pack_pallas import _is_packed

    # the packed-eligibility check applies to the ENCODED row length —
    # sub-block-split callers pass their sub length while estimating on
    # the full-length rows (same sample distribution)
    if not _is_packed(sub_length if sub_length else x.shape[1]):
        return 1
    rows = x[:: max(1, x.shape[0] // 64)][:64]
    seg = rows[:, : min(rows.shape[1], 4096)].astype(np.int32)
    d = seg.copy()
    d[:, 1:] -= seg[:, :-1]
    d = (d << 16) >> 16
    u = (d << 1) ^ (d >> 31)
    q = u >> cfg.k
    ln = np.minimum(q, 8) + 1 + cfg.k + np.where(q >= 8, 16 - cfg.k, 0)
    cum = np.cumsum(ln, axis=1)
    # expected flagged-ROW fraction at (encoded row length)/R slots
    # — the flag/re-encode unit is the encoded row, i.e. the
    # sub-stream for split callers;
    # a flagged segment re-encodes once at rate 1, so the break-even
    # is where re-encode cost (~flag_frac of a full pass) eats the
    # 1/R placement (~20% of encode) — accept up to ~15%
    enc_len = sub_length if sub_length else x.shape[1]
    rate = 1
    for r in (2, 4):
        span = cum[:, r:] - cum[:, :-r]
        p = float(np.mean(np.clip(span - 32, 0, 32)) / 32.0)
        if p * (enc_len / r) <= 0.15:
            rate = r
    return rate


def _words_hint(x: np.ndarray, cfg: RiceConfig, length: int) -> int:
    """Estimated per-segment output word cap (static, bucketed) for the
    encode placement — the encode-output mirror of :func:`_service_hint`.

    The placement concentration's cost scales with its STATIC output
    width: the worst-case bound (25 bits/sample) is 4-5x the typical
    compressed size, so well-matched data pays 4-5x the placement
    traffic for padding. This caps the width at the subsample's largest
    per-row rate plus margin; the kernel's word counts are exact
    regardless of placement width, so rows that overflow the cap are
    detected for free and re-encoded at the full bound (same
    speculate/flag/re-do contract as the emission rate and the decode
    service ladder).
    """
    full = cfg.max_words(length)
    if not cfg.is_delta or x.ndim != 2 or x.shape[1] < 64:
        return full
    rows = x[:: max(1, x.shape[0] // 64)][:64]
    seg = rows[:, : min(rows.shape[1], 4096)].astype(np.int32)
    d = seg.copy()
    d[:, 1:] -= seg[:, :-1]
    d = (d << 16) >> 16
    u = (d << 1) ^ (d >> 31)
    q = u >> cfg.k
    ln = np.minimum(q, 8) + 1 + cfg.k + np.where(q >= 8, 16 - cfg.k, 0)
    bps = ln.mean(axis=1)  # per-row bits/sample over the subsample
    # margin: worst subsampled row + 20% + slack for rows outside the
    # subsample; sampling noise of a 4096-sample mean is tiny next to it
    est = float(bps.max()) * 1.2 * length / 32.0 + 64.0
    cap = -(-int(est) // _WORD_BUCKET) * _WORD_BUCKET
    return min(cap, full)


def _reencode_bad_rows(words_np: np.ndarray, x: np.ndarray,
                       nvalid: np.ndarray, bad, cfg: RiceConfig,
                       max_words: int) -> np.ndarray:
    """Exactly re-encode (at rate 1) segments the half-rate encoder
    flagged, in place — mirror of :func:`_redecode_bad_rows`. Flagged
    rows are padded to a power-of-two row count to bound compiled
    shapes. ``words_np`` must be wide enough for every row's true word
    count (the half-rate kernel's nwords are exact even for flagged
    rows, so the caller's max-based width already is)."""
    idx = np.nonzero(np.asarray(bad))[0]
    if idx.size == 0:
        return words_np
    m = 1 << max(3, int(np.ceil(np.log2(idx.size))))
    xs = np.zeros((m, x.shape[1]), np.int16)
    xs[: idx.size] = x[idx]
    nvs = np.zeros(m, np.int32)
    nvs[: idx.size] = np.asarray(nvalid)[idx]
    wfix, _nwfix = encode_segments(
        jnp.asarray(xs), jnp.asarray(nvs), cfg, max_words, "pallas"
    )
    if not words_np.flags.writeable:
        words_np = words_np.copy()
    words_np[idx] = np.asarray(wfix)[: idx.size, : words_np.shape[1]]
    return words_np


def _reencode_bad_rows_device(words, xs: np.ndarray, nv: np.ndarray,
                              bad, cfg: RiceConfig, max_words: int,
                              p0: np.ndarray | None = None):
    """Device-resident variant of :func:`_reencode_bad_rows` for the
    split-encode path: flagged sub-streams re-encode at rate 1 (with
    their delta seeds) and scatter back into the device words array —
    no full-array host round trip."""
    idx = np.nonzero(np.asarray(bad))[0]
    if idx.size == 0:
        return words
    m = 1 << max(3, int(np.ceil(np.log2(idx.size))))
    xs2 = np.zeros((m, xs.shape[1]), np.int16)
    xs2[: idx.size] = xs[idx]
    nv2 = np.zeros(m, np.int32)
    nv2[: idx.size] = np.asarray(nv)[idx]
    p02 = np.zeros(m, np.int32)
    if p0 is not None:
        p02[: idx.size] = np.asarray(p0)[idx]
    wfix, _nw, _nb = encode_segments_bits(
        jnp.asarray(xs2), jnp.asarray(nv2), cfg, max_words, "pallas",
        jnp.asarray(p02),
    )
    return words.at[jnp.asarray(idx)].set(
        wfix[: idx.size, : words.shape[1]]
    )


def _decode_device(words: jnp.ndarray, n_samples: int, cfg: RiceConfig,
                   j_eff: int | None, speculate: bool = True):
    """Device decode; returns (samples, per-segment bad flags or None).

    ``j_eff`` below the static bound enables the reduced-service kernel,
    and ``speculate`` the clamped-displacement wide16 compaction; both
    flag affected segments for exact re-decode
    (:func:`_redecode_bad_rows`, which runs with both disabled).

    Batches beyond two 1024-lane blocks dispatch as consecutive
    <=2048-row slices (all queued asynchronously — the dispatch/collect
    contract is unchanged): measured on v5e, multi-block decode grids
    schedule worse than back-to-back smaller programs (a 2048-row
    dispatch ran 18% slower than two 1024-row ones in a quiet window,
    and the gap grows with block count: 8192 rows decoded at 17.9 vs
    ~24-28 GB/s), but every extra dispatch also pays the dev relay's
    submission cost (0.3-3 ms with relay load), so the slice stays at
    two blocks rather than one.
    """
    rows = words.shape[0]
    if rows > 2 * _LANE_TARGET:
        outs, bads = [], []
        for i in range(0, rows, 2 * _LANE_TARGET):
            o, b = _decode_device(words[i : i + 2 * _LANE_TARGET],
                                  n_samples, cfg, j_eff, speculate)
            outs.append(o)
            bads.append(b)
        out = jnp.concatenate(outs, axis=0)
        if all(b is None for b in bads):
            bad = None
        else:
            # a short remainder slice can route through a different
            # (exact) kernel family and return no flags — align it
            bad = jnp.concatenate([
                jnp.zeros((o.shape[0],), bool) if b is None else b
                for o, b in zip(outs, bads)
            ], axis=0)
        return out, bad
    res = unpack_decode_pallas(
        words, n_samples, cfg.k, cfg.is_delta, False,
        j_eff, speculate,
    )
    out, bad = res if isinstance(res, tuple) else (res, None)
    if not cfg.is_delta:
        out = prefilter_decode(out, cfg.filt)
    return out, bad


def _split_decode_enabled() -> bool:
    """Speculative split decode (:mod:`.ops.split_decode`) is built,
    junction-proofed, and byte-exact, but OFF by default: measured on
    TPU v5e (round 5), its per-sub-block compaction + ragged merge cost
    more than the serial kernel's under-occupancy it removes (NOPTREX
    256x500k: 94.6 ms split vs 43.8 ms serial; nEDM 44.8 vs 15.7 —
    docs/Parallelism.md has the full breakdown). The concentration
    passes, not the decode chain, are the v5e bottleneck; on hardware
    (or with a compaction primitive) where that flips, set
    ``DELTARICE_TPU_SPLIT_DECODE=1``."""
    import os

    return os.environ.get("DELTARICE_TPU_SPLIT_DECODE", "0") == "1"


def _decode_device_split(words: jnp.ndarray, counts, n_samples: int,
                         cfg: RiceConfig, parts: int, nvalid=None):
    """Split-decode dispatch (long segments decode as ``parts`` parallel
    speculative sub-streams; see :mod:`.ops.split_decode`). Returns
    (samples, per-segment bad flags); flagged segments re-decode exactly
    via :func:`_redecode_bad_rows`. The generic-FIR inverse runs outside
    the kernel, as in :func:`_decode_device`."""
    from .ops.split_decode import unpack_decode_split

    out, bad = unpack_decode_split(words, counts, n_samples, cfg.k,
                                   cfg.is_delta, parts, nvalid)
    if not cfg.is_delta:
        out = prefilter_decode(out, cfg.filt)
    return out, bad


def _redecode_bad_rows(out_np: np.ndarray, bad, words_np: np.ndarray,
                       n_samples: int, cfg: RiceConfig) -> np.ndarray:
    """Exactly re-decode segments the service kernel flagged, in place.

    Flagged rows are gathered, padded to a power-of-two row count (bounds
    the set of compiled shapes), and run through the full-unroll kernel.
    """
    if bad is None:
        return out_np
    idx = np.nonzero(np.asarray(bad))[0]
    if idx.size == 0:
        return out_np
    if not out_np.flags.writeable:
        out_np = out_np.copy()
    rows = words_np[idx]
    p = 1 << (int(idx.size) - 1).bit_length()
    rows = np.pad(rows, ((0, p - idx.size), (0, 0)))
    fixed, _ = _decode_device(jnp.asarray(rows), n_samples, cfg, None,
                              speculate=False)
    out_np[idx] = np.asarray(fixed)[: idx.size]
    return out_np


def decode_segments(words: jnp.ndarray, n_samples: int, cfg: RiceConfig,
                    backend: str = "auto", counts=None, nvalid=None):
    """Decode per-segment word streams back to int16 samples.

    words: (num_segments, W) uint32 with at least one zero pad word per row.
    Returns (num_segments, n_samples) int16 (tail of short segments is
    garbage; callers slice by true counts).

    backend: "pallas" (word-synchronous TPU kernel; its W-chunked grid
    bounds VMEM by construction for any stream length), "scan" (XLA
    per-sample scan), or "auto" (pallas on TPU, scan elsewhere).

    counts/nvalid: optional per-segment word counts (from the header walk)
    and valid-sample counts; when given, the pallas path sizes its service
    rate to the data and escape-heavy/mismatched-M streams decode several
    times faster (flagged lag overruns re-decode exactly, synchronously —
    callers needing asynchrony use the batch dispatch/collect pipeline).
    """
    enable_persistent_cache()  # first TPU compile costs minutes; persist it
    if backend == "auto":
        backend = "pallas" if jax.default_backend() == "tpu" else "scan"
    if backend == "pallas":
        j_eff = None
        if counts is not None and nvalid is not None:
            j_eff = _service_hint(counts, nvalid, cfg.k)
        if counts is not None and _split_decode_enabled():
            from .ops.split_decode import decode_split_parts

            parts = decode_split_parts(
                words.shape[0], int(np.asarray(counts).max(initial=1)),
                cfg.k, j_eff,
            )
            if parts > 1:
                out, bad = _decode_device_split(words, counts, n_samples,
                                                cfg, parts, nvalid)
                if bool(np.asarray(jnp.any(bad))):
                    out = jnp.asarray(_redecode_bad_rows(
                        np.asarray(out), bad, np.asarray(words), n_samples,
                        cfg,
                    ))
                return out
        out, bad = _decode_device(words, n_samples, cfg, j_eff)
        if bad is not None and bool(np.asarray(jnp.any(bad))):
            out = jnp.asarray(_redecode_bad_rows(
                np.asarray(out), bad, np.asarray(words), n_samples, cfg
            ))
        return out
    return _decode_segments_scan(words, n_samples, cfg)


def _segment_layout(total: int, cfg: RiceConfig):
    nseg, length, leftover = cfg.segments(total)
    nvalid = np.full(nseg, length, dtype=np.int32)
    if leftover:
        nvalid[-1] = leftover
    return nseg, length, nvalid


# --- sub-block-split encode for long waveforms -------------------------
#
# A Rice stream is a bit-concatenation of per-sample codewords, and the
# delta filter's only cross-sample state is the previous sample — so a
# long waveform can encode as P independent sub-blocks across kernel
# lanes (each seeded with its predecessor's last sample) whose packed
# sub-streams then concatenate at bit offsets, bit-identical to the
# serial pass. This fills the 1024-lane kernel grid for small-batch
# long-segment workloads (NOPTREX: 256 x 500000) and drops the slot axis
# below 2**15 so placement rides the packed concentration planes instead
# of the slower wide butterfly (nEDM: 81920-sample segments). The
# reference has no counterpart: its OpenMP parallelism stops at whole
# waveforms (/root/reference/src/deltaRice.c:417-426).

_SPLIT_MIN_SUB = 8192    # don't split below this sub-block length
_SPLIT_PACKED = 1 << 15  # sub-block length that keeps placement packed
_LANE_TARGET = 1024      # one full kernel block of lanes


def _split_parts(nseg: int, length: int, cfg: RiceConfig) -> int:
    """Sub-blocks per segment (1 = no split)."""
    if length < 2 * _SPLIT_MIN_SUB:
        return 1
    parts = 1
    # fill the lane grid, then keep halving until the slot axis is packed
    while (length // (2 * parts) >= _SPLIT_MIN_SUB
           and (nseg * 2 * parts <= _LANE_TARGET
                or length // parts >= _SPLIT_PACKED)):
        parts *= 2
    return parts


def _split_layout(padded: np.ndarray, nvalid: np.ndarray, parts: int,
                  halo: int = 0):
    """(rows, L) -> ((rows*parts, halo+Ls), per-sub nvalid, per-sub prev0).

    ``halo`` leading samples per sub-block carry the predecessor's tail
    (zeros for the first block) — what a generic causal FIR pre-filter
    needs to produce the serial pass's outputs at block starts; the
    delta path instead uses ``prev0`` (its entire recurrence state).
    """
    rows, length = padded.shape
    ls = -(-length // parts)
    xp = padded
    if parts * ls != length or halo:
        xp = np.zeros((rows, halo + parts * ls), padded.dtype)
        xp[:, halo : halo + length] = padded
        if halo:
            strided = np.lib.stride_tricks.sliding_window_view(
                xp, halo + ls, axis=1
            )[:, ::ls][:, :parts]
            x3 = strided
        else:
            x3 = xp[:, halo:].reshape(rows, parts, ls)
    else:
        x3 = xp.reshape(rows, parts, ls)
    prev0 = np.zeros((rows, parts), np.int32)
    prev0[:, 1:] = x3[:, :-1, -1]
    nv = np.clip(
        nvalid[:, None] - np.arange(parts, dtype=np.int64)[None, :] * ls,
        0, ls,
    ).astype(np.int32)
    return (np.ascontiguousarray(x3.reshape(rows * parts, halo + ls)),
            nv.reshape(-1), prev0.reshape(-1), ls)


def _encode_split_rows(padded2d: np.ndarray, nvalid_rows: np.ndarray,
                       cfg: RiceConfig, parts: int, method: str,
                       rate: int = 1):
    """Sub-block-split encode of (rows, L): returns (words, nwords,
    nbits, sub_length, fix). Delta seeds each block with its
    predecessor's last sample; generic FIR filters each block over a
    (ntaps-1)-sample halo of preceding raw samples — both reproduce the
    serial filter outputs exactly, so the merged stream is byte-
    identical. With ``rate`` 2 (delta only) the half-rate emission runs
    and ``fix`` carries (bad, xs, nv, p0, max_words) — callers apply
    :func:`_reencode_bad_rows_device` BEFORE the sub-stream merge; the
    flags stay on device until then, so the dispatch never syncs."""
    if cfg.is_delta:
        xs, nv, p0, ls = _split_layout(padded2d, nvalid_rows, parts)
        mw = cfg.max_words(ls)
        if rate > 1:
            from .ops.pack_pallas import pack_encode_pallas_bits

            w, nw, nb, bad = pack_encode_pallas_bits(
                jnp.asarray(xs), jnp.asarray(nv), cfg.k, mw, True,
                jnp.asarray(p0), rate,
            )
            return w, nw, nb, ls, (bad, xs, nv, p0, mw)
        w, nw, nb = encode_segments_bits(
            jnp.asarray(xs), jnp.asarray(nv), cfg, mw,
            method, jnp.asarray(p0),
        )
    else:
        halo = len(cfg.filt) - 1
        xs, nv, _p0, ls = _split_layout(padded2d, nvalid_rows, parts, halo)
        d = prefilter_encode(jnp.asarray(xs), cfg.filt)[:, halo:]
        w, nw, nb = encode_segments_bits(
            d, jnp.asarray(nv), cfg, cfg.max_words(ls), method,
            prefiltered=True,
        )
    return w, nw, nb, ls, None


@functools.partial(jax.jit, static_argnums=(2, 3))
def _merge_device(words3: jnp.ndarray, nbits2: jnp.ndarray, out_w: int,
                  interpret: bool = False):
    """Device-side sub-stream merge: shifted-OR concatenation at bit
    offsets, formulated as ONE butterfly concentration.

    Pre-shifting part p's words by its start-bit remainder r gives
    ``sh[j] = src[j] >> r | src[j-1] << (32-r)`` whose word j lands at
    output word ``w0_p + j`` — a displacement CONSTANT per part. The
    butterfly's conflict-freedom needs CONSECUTIVE destinations (rank
    concentration), so each part's boundary tail word — which shares an
    output word with its successor — is pre-ORed into the successor's
    first shifted word (bit-disjoint by the packer's zero-fill); where
    the successor starts word-aligned (r == 0) or there is none, the
    tail extends the part's own run instead. Every output word then has
    exactly ONE source element and the A plane is a true concentration.
    Replaces the host merge (memcpy-speed, but host-bandwidth-bound:
    ~0.8 GB/s on a weak host) on the TPU path.

    Requires every valid part except possibly each row's last to span
    at least two output words (guaranteed by nb >= 64; true for
    sub-block splits: >= _SPLIT_MIN_SUB samples at >= 1 bit each);
    callers fall back to the host merge otherwise. words3 must be zero
    past each stream's words.
    """
    from .ops.concentrate_pallas import concentrate_pallas

    rows, parts, w_in = words3.shape
    nb = nbits2.astype(jnp.int32)  # < 2^31 bits per sub-stream/row
    base = jnp.cumsum(nb, axis=1) - nb
    w0 = base >> 5
    r2 = base & 31
    r = r2.astype(jnp.uint32)[:, :, None]
    src = words3
    prev = jnp.pad(src[:, :, :-1], ((0, 0), (0, 0), (1, 0)))
    sh = jnp.where(
        r == 0, src, (src >> r) | (prev << ((jnp.uint32(32) - r)
                                            & jnp.uint32(31)))
    )
    last = (base + nb - 1) >> 5
    m_a = last - w0  # whole-word run length (tail word excluded)
    valid = nb > 0
    j_idx = jnp.arange(w_in, dtype=jnp.int32)[None, None, :]
    # tails: each part's boundary word sh[m_a] (gather-free one-hot sum)
    tails = jnp.sum(
        jnp.where(j_idx == m_a[:, :, None], sh, jnp.uint32(0)),
        axis=2, dtype=jnp.uint32,
    )
    # carry[p] = nearest preceding valid part's tail (skips empty parts)
    carry_cols = []
    c = jnp.zeros((rows,), jnp.uint32)
    for p in range(parts):
        carry_cols.append(c)
        c = jnp.where(valid[:, p], tails[:, p], c)
    carry = jnp.stack(carry_cols, axis=1)
    # extend[p]: keep the tail in part p's own run — the next valid part
    # starts word-aligned (its r == 0) or doesn't exist
    ext_cols = [None] * parts
    nxt_aligned = jnp.ones((rows,), bool)
    for p in reversed(range(parts)):
        ext_cols[p] = nxt_aligned
        nxt_aligned = jnp.where(valid[:, p], r2[:, p] == 0, nxt_aligned)
    extend = valid & jnp.stack(ext_cols, axis=1)
    # fold each tail into the successor's first word where they share it
    first = sh[:, :, 0] | jnp.where(valid & (r2 != 0), carry,
                                    jnp.uint32(0))
    sh = jnp.concatenate([first[:, :, None], sh[:, :, 1:]], axis=2)
    valid_a = valid[:, :, None] & (
        (j_idx < m_a[:, :, None])
        | (extend[:, :, None] & (j_idx == m_a[:, :, None]))
    )
    p_idx = jnp.arange(parts, dtype=jnp.int32)[None, :]
    disp_a = jnp.where(valid_a, (p_idx * w_in - w0)[:, :, None], -1)
    return concentrate_pallas(
        sh.reshape(rows, parts * w_in),
        disp_a.reshape(rows, parts * w_in), out_w, None, interpret,
    )


def merge_substreams_device(words, nbits2: np.ndarray, parts: int):
    """Merge sub-streams on device; returns (merged np.uint32 (rows,
    maxw), nwords) — or ``None`` when a middle sub-stream holds < 32
    bits (the B plane's strict monotonicity needs whole words; the
    split layout only produces that for a segment's last sub-block, but
    callers of the public host merge may not). ``words`` is the
    (rows*parts, W) device array from the split encode; only
    ~actual-compressed bytes cross device->host.
    """
    nb = np.ascontiguousarray(nbits2, dtype=np.int64)
    rows = nb.shape[0]
    nz = nb > 0
    if nz.any():
        # every valid part except each row's last must span >= 2 output
        # words (its boundary word must not also be its first)
        base = np.cumsum(nb, axis=1) - nb
        m_a = ((base + nb - 1) >> 5) - (base >> 5)
        idx = np.arange(nb.shape[1])[None, :]
        last_nz = nb.shape[1] - 1 - np.argmax(nz[:, ::-1], axis=1)
        if (nz & (m_a < 1) & (idx != last_nz[:, None])).any():
            return None
    total_bits = nb.sum(axis=1)
    nwords = (total_bits + 31) >> 5
    maxw = int(nwords.max(initial=0))
    out_w = max(-(-(maxw + 1) // _WORD_BUCKET) * _WORD_BUCKET, parts)
    w = min(int(words.shape[1]),
            max(-(-int((nb.max(initial=0) + 31) >> 5) // _WORD_BUCKET)
                * _WORD_BUCKET, 1))
    w3 = words[:, :w].reshape(rows, parts, w)
    merged = _merge_device(w3, jnp.asarray(nb), out_w)
    return np.asarray(merged)[:, :maxw], nwords


def merge_substreams(words3: np.ndarray, nbits2: np.ndarray):
    """Concatenate per-sub-block word streams at bit offsets (host side).

    words3: (rows, P, W) uint32 packed sub-streams, zero beyond each
      stream's words (incl. the final partial word's low bits — the
      packer's zero-fill makes the shifted OR collision-free).
    nbits2: (rows, P) exact bit lengths.

    Returns (merged (rows, max_words) uint32, nwords (rows,) int64) —
    byte-identical to serially encoding each row's full waveform. Runs in
    the native C library (OpenMP) when built; numpy fallback otherwise.
    """
    rows, parts, w_in = words3.shape
    total_bits = nbits2.astype(np.int64).sum(axis=1)
    nwords = (total_bits + 31) >> 5
    maxw = int(nwords.max(initial=0))
    out = np.zeros((rows, maxw + 1), dtype=np.uint32)
    from .native import codec_lib

    lib = codec_lib()
    if lib is not None and hasattr(lib, "dr_merge_substreams"):
        words3 = np.ascontiguousarray(words3)
        nb = np.ascontiguousarray(nbits2, dtype=np.int64)
        lib.dr_merge_substreams(
            words3.ctypes.data, rows, parts, w_in,
            nb.ctypes.data, maxw + 1, out.ctypes.data,
        )
        return out[:, :maxw], nwords
    # vectorized over rows (parts is a short loop): each part's words are
    # shifted by the row's bit phase and OR-placed at its word offset. A
    # row's columns within one part are distinct, so plain fancy |= is
    # collision-free; words beyond a stream's length are zero by the
    # packer's zero-fill, so over-width stores OR zeros (clipped to the
    # scratch column, which is discarded).
    nb64 = nbits2.astype(np.int64)
    base = np.cumsum(nb64, axis=1) - nb64  # (rows, P) start bit offsets
    ridx = np.arange(rows)[:, None]
    for p in range(parts):
        nb_p = nb64[:, p]
        mmax = int(((nb_p.max(initial=0)) + 31) >> 5)
        if mmax == 0:
            continue
        w = words3[:, p, :mmax]
        r = (base[:, p] & 31).astype(np.uint32)[:, None]
        w0 = (base[:, p] >> 5).astype(np.int64)[:, None]
        phase = r != 0
        lo = np.where(phase, w >> r, w)
        hi = np.where(phase, w << ((np.uint32(32) - r) & np.uint32(31)),
                      np.uint32(0))
        cols = w0 + np.arange(mmax, dtype=np.int64)[None, :]
        np.minimum(cols, maxw, out=cols)
        out[ridx, cols] |= lo
        out[ridx, np.minimum(cols + 1, maxw)] |= hi
    return out[:, :maxw], nwords


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
    parts = _split_parts(nseg, length, cfg)
    if parts > 1:
        rate = 1
        if (method in ("auto", "pallas")
                and jax.default_backend() == "tpu"):
            ls = _split_layout(padded[:1], nvalid[:1], parts)[3]
            rate = _rate_hint(padded, cfg, ls)
        words, nwords, nbits, _ls, sfix = _encode_split_rows(
            padded, nvalid, cfg, parts, method, rate
        )
        if sfix is not None:
            bad, xs, nvs, p0, mws = sfix
            words = _reencode_bad_rows_device(words, xs, nvs, bad, cfg,
                                              mws, p0)
        nb2 = np.asarray(nbits).reshape(nseg, parts)
        res = None
        if jax.default_backend() == "tpu":
            res = merge_substreams_device(words, nb2, parts)
        if res is None:
            nws = np.asarray(nwords)
            w = max(int(nws.max(initial=0)), 1)
            res = merge_substreams(
                np.asarray(words[:, :w]).reshape(nseg, parts, w), nb2
            )
        return frame_stream(total, *res)
    mw = cfg.max_words(length)
    if method == "auto":
        method = "pallas" if jax.default_backend() == "tpu" else "segsum"
    rate = _rate_hint(padded, cfg) if method == "pallas" else 1
    cap = _words_hint(padded, cfg, length) if method == "pallas" else mw
    if rate > 1:
        from .ops.pack_pallas import pack_encode_pallas_bits

        words, nwords, _nb, bad = pack_encode_pallas_bits(
            jnp.asarray(padded), jnp.asarray(nvalid), cfg.k, cap, True,
            None, rate,
        )
        bad = np.asarray(bad)
    else:
        words, nwords = encode_segments(
            jnp.asarray(padded), jnp.asarray(nvalid), cfg, cap, method
        )
        bad = None
    # device->host moves ~actual-compressed bytes, not the 25-bit worst
    # case: fetch the (tiny, exact) word counts first, then slice on
    # device; rows past the placement cap re-encode at the full bound
    nw = np.asarray(nwords)
    w = max(int(nw.max(initial=0)), 1)
    wn = np.asarray(words[:, : min(w, cap)])
    if w > cap:
        wn = np.pad(wn, ((0, 0), (0, w - cap)))
    over = nw > cap
    if bad is not None:
        over = over | bad
    if over.any():
        wn = _reencode_bad_rows(wn, padded, nvalid, over, cfg, mw)
    return frame_stream(total, wn, nw)


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
        return (arrs, 0, None, None, None, 1, None)
    total = arrs[0].size
    if any(a.size != total for a in arrs):
        raise ValueError("compress_batch requires equal-sized chunks")
    if total == 0:  # header-only streams, matching compress()
        return (arrs, 0, None, None, None, 1, None)
    nseg, length, nvalid = _segment_layout(total, cfg)
    nchunks = len(arrs)
    padded = np.zeros((nchunks, nseg, length), dtype=np.int16)
    padded.reshape(nchunks, -1)[:, :total] = np.stack(arrs)
    parts = _split_parts(nseg, length, cfg)
    if parts > 1:
        rows2 = padded.reshape(nchunks * nseg, length)
        nv2 = np.tile(nvalid, nchunks)
        rate = 1
        if (method in ("auto", "pallas")
                and jax.default_backend() == "tpu"):
            ls = _split_layout(rows2[:1], nv2[:1], parts)[3]
            rate = _rate_hint(rows2, cfg, ls)
        words, nwords, nbits, _ls, sfix = _encode_split_rows(
            rows2, nv2, cfg, parts, method, rate
        )
        return (arrs, total, words, nwords, nbits, parts, sfix)
    x2 = padded.reshape(nchunks * nseg, length)
    nv = np.tile(nvalid, nchunks)
    mw = cfg.max_words(length)
    m = method
    if m == "auto":
        m = "pallas" if jax.default_backend() == "tpu" else "segsum"
    rate = _rate_hint(x2, cfg) if m == "pallas" else 1
    cap = _words_hint(x2, cfg, length) if m == "pallas" else mw
    if rate > 1:
        from .ops.pack_pallas import pack_encode_pallas_bits

        words, nwords, _nb, bad = pack_encode_pallas_bits(
            jnp.asarray(x2), jnp.asarray(nv), cfg.k, cap, True, None,
            rate,
        )
        # bad stays on device until collect — the dispatch never syncs,
        # preserving the window overlap (same contract as decode's lag
        # flags); collect re-encodes flagged rows exactly
        return (arrs, total, words, nwords, None, 1, (bad, x2, nv, mw))
    words, nwords = encode_segments(
        jnp.asarray(x2), jnp.asarray(nv), cfg, cap, method
    )
    return (arrs, total, words, nwords, None, 1, None)


def compress_batch_collect(handle, cfg: RiceConfig = RiceConfig(),
                           method: str = "auto", verify: bool = False,
                           retries: int = 2) -> list[bytes]:
    """Fetch + frame the streams of a :func:`compress_batch_dispatch`."""
    arrs, total, words, nwords, nbits, parts, fix = handle
    if not arrs:
        return []
    if total == 0:
        return [np.zeros(1, dtype="<u4").tobytes() for _ in arrs]
    nchunks = len(arrs)
    nseg = _segment_layout(total, cfg)[0]
    # fetch word counts first, then move only ~compressed-size bytes D2H
    nwords = np.asarray(nwords)
    w = max(int(nwords.max(initial=0)), 1)
    if parts > 1:
        if fix is not None:  # half-rate split: fix sub-streams pre-merge
            bad, xs, nv, p0, mw = fix
            words = _reencode_bad_rows_device(words, xs, nv, bad, cfg,
                                              mw, p0)
        nb2 = np.asarray(nbits).reshape(nchunks * nseg, parts)
        res = None
        if jax.default_backend() == "tpu":
            res = merge_substreams_device(words, nb2, parts)
        if res is None:
            res = merge_substreams(
                np.asarray(words[:, :w]).reshape(nchunks * nseg, parts,
                                                 w), nb2
            )
        merged, nw = res
        merged = merged.reshape(nchunks, nseg, -1)
        nw = nw.reshape(nchunks, nseg)
        streams = [
            frame_stream(total, merged[c], nw[c]) for c in range(nchunks)
        ]
    else:
        # the device words array is only cap wide (placement width hint);
        # rows past the cap and reduced-rate overflow rows re-encode
        # exactly at the full bound — both flag sets are already known
        cap = words.shape[1]
        wn = np.asarray(words[:, : min(w, cap)])
        if w > cap:
            wn = np.pad(wn, ((0, 0), (0, w - cap)))
        over = nwords > cap
        if fix is not None:  # reduced-rate encode: add the emit flags
            bad, x2, nv, mw = fix
            over = over | np.asarray(bad)
        if over.any():
            if fix is None:
                length = _segment_layout(total, cfg)[1]
                nvalid = _segment_layout(total, cfg)[2]
                padded = np.zeros((nchunks, nseg, length), np.int16)
                padded.reshape(nchunks, -1)[:, :total] = np.stack(arrs)
                x2 = padded.reshape(nchunks * nseg, length)
                nv = np.tile(nvalid, nchunks)
                mw = cfg.max_words(length)
            wn = _reencode_bad_rows(wn, x2, nv, over, cfg, mw)
        nwords = nwords.reshape(nchunks, nseg)
        words = wn.reshape(nchunks, nseg, -1)
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
        return (0, 0, None, [])
    bufs = [np.frombuffer(memoryview(s), dtype="<u4") for s in streams]
    if any(b.size == 0 for b in bufs):
        raise ValueError("truncated Delta-Rice stream")
    total = int(bufs[0][0])
    if any(int(b[0]) != total for b in bufs):
        raise ValueError("decompress_batch requires equal-sized chunks")
    if total == 0:
        return (len(bufs), 0, None, [])
    if backend == "auto":
        backend = "pallas" if jax.default_backend() == "tpu" else "scan"
    nseg, length, nvalid = _segment_layout(total, cfg)
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
        words2 = words.reshape(-1, bucket)
        if backend == "pallas":
            from .ops.split_decode import decode_split_parts

            counts_all = np.concatenate(
                [per_chunk[i][1] for i in idxs]
            )
            j_eff = _service_hint(counts_all, np.tile(nvalid, len(idxs)),
                                  cfg.k)
            parts = 1
            if _split_decode_enabled():
                parts = decode_split_parts(
                    words2.shape[0], int(counts_all.max(initial=1)),
                    cfg.k, j_eff,
                )
            if parts > 1:
                dec, bad = _decode_device_split(
                    jnp.asarray(words2), counts_all, length, cfg, parts,
                    np.tile(nvalid, len(idxs)),
                )
            else:
                dec, bad = _decode_device(jnp.asarray(words2), length,
                                          cfg, j_eff)
        else:
            dec, bad = _decode_segments_scan(
                jnp.asarray(words2), length, cfg
            ), None
        # ``bad`` (the reduced-service kernel's lag flags) stays on
        # device until collect so this dispatch never synchronizes —
        # that's what lets callers overlap decode with file I/O
        pending.append((idxs, dec, bad, words2, nseg * length))
    return (len(bufs), total, (length, cfg), pending)


def decompress_batch_collect(handle) -> list[np.ndarray]:
    """Fetch the arrays of a :func:`decompress_batch_dispatch`; segments
    the reduced-service decode flagged re-decode exactly here."""
    n, total, meta, pending = handle
    if n == 0:
        return []
    if total == 0:
        return [np.zeros(0, dtype=np.int16) for _ in range(n)]
    length, cfg = meta
    out: list[np.ndarray | None] = [None] * n
    for idxs, dec, bad, words2, flat in pending:
        dec_np = np.asarray(dec)
        if bad is not None:
            dec_np = _redecode_bad_rows(dec_np, bad, words2, length, cfg)
        dec_np = dec_np.reshape(len(idxs), flat)
        for j, i in enumerate(idxs):
            out[i] = dec_np[j, :total].copy()
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
    nseg, length, nvalid = _segment_layout(total, cfg)
    counts, starts = walk_headers(buf, nseg)
    words = gather_segments(buf, counts, starts)
    out = decode_segments(jnp.asarray(words), length, cfg, backend,
                          counts=counts, nvalid=nvalid)
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
    """Assemble the framed chunk from padded per-segment words (host side).

    Runs in the native C library (OpenMP memcpy per segment — the
    analog of the reference's serial compaction, ``src/deltaRice.c:
    427-432``) when built; the numpy fallback's fancy-index scatter
    costs ~6x more on the same cores and dominated the projected file
    WRITE path before the native routine existed."""
    counts = np.ascontiguousarray(nwords, dtype=np.int64)
    nseg = counts.shape[0]
    word_start = np.zeros(nseg + 1, dtype=np.int64)
    np.cumsum(counts, out=word_start[1:])
    total_words = int(word_start[-1])
    from .native import codec_lib

    lib = codec_lib()
    if (lib is not None and hasattr(lib, "dr_frame_rows")
            and words.shape[1] >= int(counts.max(initial=0))):
        # fill a bytearray-backed view directly: returning it (a
        # bytes-like callers hash/compare/write identically) skips the
        # whole-stream tobytes() copy
        raw = bytearray(4 * (1 + nseg + total_words))
        out = np.frombuffer(raw, dtype="<u4")
        offsets = 1 + np.arange(nseg, dtype=np.int64) + word_start[:-1]
        words = np.ascontiguousarray(words, dtype=np.uint32)
        lib.dr_frame_rows(
            words.ctypes.data, nseg, words.shape[1],
            counts.ctypes.data, offsets.ctypes.data, total,
            out.ctypes.data,
        )
        return bytes(raw) if nseg < 1024 else raw
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
