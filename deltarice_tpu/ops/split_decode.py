"""Pallas TPU split decode: speculative intra-segment decode parallelism.

The decode kernel (:mod:`.unpack_pallas`) amortizes the bitstream's serial
dependency across segments — but a batch of FEW, LONG segments (NOPTREX:
256 x 500,000 samples, ``/root/reference/docs/Performance.md:38-47``)
leaves 3/4 of the lane grid empty and walks a ~80k-word serial chain per
lane, and its slot axis outgrows the fast packed concentration. The
reference has no answer either: its OpenMP parallelism stops at whole
waveforms (``/root/reference/src/deltaRice.c:327-335``). This module
splits each segment's WORD stream into P uniform ranges ("sub-blocks")
that decode in parallel lanes, exactly.

Sub-block p > 0 cannot know the bit phase at which the first codeword of
its range starts (codeword boundaries are data-dependent), so it
SPECULATES: it starts decoding ``halo`` words early at bit phase 0 and
rides Rice's rapid self-synchronization — after a few garbage codewords
the cursor lands on the true codeword lattice for essentially all
physical data. The junction check then makes the speculation EXACT: the
kernel captures each sub-block's cursor phase entering its first owned
word (``entry``) and entering its successor's first word (``exit``).
``entry_p == exit_{p-1}`` at every junction implies, by induction from
sub-block 0's known phase 0, that every sub-block decoded from the TRUE
bit position — a decode is a pure function of (bits, start position), so
equality is correctness and coincidence is impossible. Any mismatch
(adversarial never-syncing streams exist, e.g. a stream of all-1 bits at
k=1 entered off-lattice) flags the segment for the caller's exact
full-serial re-decode — the same speculate/flag/re-do contract as the
decode service ladder and the half-rate encoder.

Sample counts and the delta state chain through tiny per-sub-block
scalars: each sub-block returns its local sample count and final sample
value; exclusive (wrapping) prefix sums over p give each sub-block's
global sample offset and entry value, applied after the per-sub-block
compaction. Trailing zero-fill bits of a segment's final word decode as
phantom escape codewords in its LAST nonempty sub-block; they sit after
the true samples and are dropped by the count-bounded merge (the serial
kernel masks them with its static sample count instead).

The assembled segment is byte-exact vs the serial kernel whenever no
flag fires (tests assert this on every geometry plus the adversarial
never-sync stream).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .unpack_pallas import _GROUP, _LANES, _decode_one, codewords_per_word

_SB = 8          # split rows always fill the full (8, 128) vreg
_DEAD = -(1 << 31)
_HALO_MAX = 64   # upper bound on the speculative warm-up window
_TAIL = 2        # successor words appended so the last owned word's
                 # codewords can read their 64-bit window


def _halo_words(spw: float) -> int:
    """Warm-up words per sub-block, sized to ~56 decoded codewords.

    Dense streams (5-8 starts/word) self-synchronize within a few
    codewords; escape-heavy ones (~1.3 starts/word) wander longer
    (measured: an 8-word halo leaves ~20% of junctions unsynced on
    uniform-random data, a 44-word one sub-percent), so the window
    scales with the header-known mean codeword rate."""
    return max(8, min(_HALO_MAX, int(56.0 / max(spw, 0.5))))


def _chunk_words(j: int) -> int:
    """Words per grid chunk (same VMEM budget rule as the serial kernel)."""
    wc = 16
    while wc * 2 * j * _SB <= 8192:
        wc *= 2
    return wc


def _split_kernel(words_ref, next_ref, wv_ref, first_ref, plane_ref,
                  meta_ref, carry_ref, scratch_ref, *, wc: int, k: int,
                  delta: bool, halo: int, j: int):
    """One grid step: decode ``wc`` words of 1024 sub-block rows.

    words_ref: (wc*8, 128) uint32 — row t*8+s is word t of sublane-group s.
    next_ref:  (GROUP*8, 128) uint32 — first words of the next chunk.
    wv_ref:    (8, 128) int32 — words OWNED by each row (its recording
               window is word indices [halo, halo+wv)).
    first_ref: (8, 128) int32 — 1 where the row is its segment's first
               sub-block: its true entry state is known (phase 0 at word
               ``halo``), so the cursor is reset there instead of trusting
               the zero-halo speculation.
    plane_ref: (j*wc*8, 128) int32 — packed concentration plane
               ``disp << 16 | sample-halfword`` (dead = INT32_MIN), slot
               (t, jj) at row (t*j + jj)*8 + s, LOCAL to the row.
    meta_ref:  (32, 128) int32 — written by the last chunk: rows 0-7
               entry phase, 8-15 exit phase, 16-23 local sample count,
               24-31 local final sample value (delta state).
    carry_ref: (40, 128) int32 scratch — pos / n / acc / ent / ext.
    """
    c = pl.program_id(1)

    @pl.when(c == 0)
    def _():
        carry_ref[:, :] = jnp.zeros_like(carry_ref)

    pos = carry_ref[0:_SB, :]
    n = carry_ref[_SB : 2 * _SB, :]
    acc = carry_ref[2 * _SB : 3 * _SB, :]
    ent = carry_ref[3 * _SB : 4 * _SB, :]
    ext = carry_ref[4 * _SB : 5 * _SB, :]
    wv = wv_ref[:, :]
    first = first_ref[:, :] != 0
    hw = halo + wv  # first word NOT owned by the row

    n_groups = wc // _GROUP
    gsz = _GROUP * _SB

    def group_step(g, carry):
        pos, n, acc, ent, ext = carry
        row0 = pl.multiple_of(g * gsz, gsz)
        cur = words_ref[pl.ds(row0, gsz), :]
        within = words_ref[
            pl.ds(pl.multiple_of(jnp.minimum(g + 1, n_groups - 1) * gsz,
                                 gsz), _SB), :
        ]
        nxt0 = jnp.where(g + 1 < n_groups, within, next_ref[0:_SB, :])
        for tt in range(_GROUP):
            w0 = cur[tt * _SB : (tt + 1) * _SB, :]
            w1 = (
                cur[(tt + 1) * _SB : (tt + 2) * _SB, :]
                if tt + 1 < _GROUP
                else nxt0
            )
            t = c * wc + g * _GROUP + tt  # traced scalar word index
            # entering the first owned word: first rows KNOW the phase
            # (0); others keep the halo speculation. Captured entry/exit
            # phases are the junction check's evidence.
            pos = jnp.where(first & (t == halo), 0, pos)
            ent = jnp.where(t == halo, pos, ent)
            ext = jnp.where(t == hw, pos, ext)
            rec = (t >= halo) & (t < hw)
            for jj in range(j):
                active = pos < 32
                u, clen = _decode_one(w0, w1, pos, k)
                x = (u >> 1) ^ -(u & 1)  # un-zigzag
                valid = active & rec
                if delta:
                    s = ((acc + x) << 16) >> 16  # wrapping int16 prefix
                    acc = jnp.where(valid, s, acc)
                    out = acc
                else:
                    out = x
                slot = t * j + jj
                disp = slot - n
                scratch_ref[(tt * j + jj) * _SB : (tt * j + jj + 1) * _SB, :] = (
                    jnp.where(valid, (disp << 16) | (out & 0xFFFF), _DEAD)
                )
                pos = jnp.where(active, pos + clen, pos)
                n = n + valid.astype(jnp.int32)
            pos = pos - 32
        plane_ref[pl.ds(pl.multiple_of(row0 * j, gsz), gsz * j), :] = (
            scratch_ref[0 : gsz * j, :]
        )
        return pos, n, acc, ent, ext

    pos, n, acc, ent, ext = jax.lax.fori_loop(
        0, n_groups, group_step, (pos, n, acc, ent, ext)
    )
    carry_ref[0:_SB, :] = pos
    carry_ref[_SB : 2 * _SB, :] = n
    carry_ref[2 * _SB : 3 * _SB, :] = acc
    carry_ref[3 * _SB : 4 * _SB, :] = ent
    carry_ref[4 * _SB : 5 * _SB, :] = ext

    @pl.when(c == pl.num_programs(1) - 1)
    def _():
        meta_ref[0:_SB, :] = ent
        meta_ref[_SB : 2 * _SB, :] = ext
        meta_ref[2 * _SB : 3 * _SB, :] = n
        meta_ref[3 * _SB : 4 * _SB, :] = acc


@functools.partial(jax.jit, static_argnums=(3, 4, 5, 6, 7))
def _split_kernel_program(subs: jnp.ndarray, wv: jnp.ndarray,
                          first: jnp.ndarray, k: int, delta: bool,
                          halo: int, j: int, interpret: bool = False):
    """Run the split kernel over (rows, width) sub-block word streams.

    Returns (plane tiled (blocks, slots*8, 128) int32, ent, ext, nloc,
    accf — each (rows,) int32).
    """
    from .transpose_pallas import transpose2d

    rows, width = subs.shape
    bseg = _SB * _LANES
    blocks = -(-rows // bseg)
    wc = _chunk_words(j)
    n_chunks = -(-width // wc)
    cols = (n_chunks + 1) * wc  # one extra zero chunk for next_ref
    w = jnp.pad(subs, ((0, blocks * bseg - rows), (0, cols - width)))
    wvp = jnp.pad(wv.astype(jnp.int32), (0, blocks * bseg - rows))
    fip = jnp.pad(first.astype(jnp.int32), (0, blocks * bseg - rows))

    w3 = w.reshape(blocks, bseg, cols)
    wt = jax.vmap(functools.partial(transpose2d, interpret=interpret))(w3)
    wt = wt.reshape(blocks, cols, _SB, _LANES).reshape(
        blocks, cols * _SB, _LANES
    )
    wv3 = wvp.reshape(blocks, _SB, _LANES)
    fi3 = fip.reshape(blocks, _SB, _LANES)

    kern = functools.partial(_split_kernel, wc=wc, k=k, delta=delta,
                             halo=halo, j=j)
    gsz = _GROUP * _SB
    small = pl.BlockSpec((None, _SB, _LANES), lambda b, c: (b, 0, 0),
                         memory_space=pltpu.VMEM)
    plane_t, meta = pl.pallas_call(
        kern,
        grid=(blocks, n_chunks),
        in_specs=[
            pl.BlockSpec((None, wc * _SB, _LANES), lambda b, c: (b, c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, gsz, _LANES),
                         lambda b, c: (b, (c + 1) * (wc // _GROUP), 0),
                         memory_space=pltpu.VMEM),
            small,
            small,
        ],
        out_specs=[
            pl.BlockSpec((None, j * wc * _SB, _LANES),
                         lambda b, c: (b, c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 4 * _SB, _LANES), lambda b, c: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(
                (blocks, n_chunks * j * wc * _SB, _LANES), jnp.int32
            ),
            jax.ShapeDtypeStruct((blocks, 4 * _SB, _LANES), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((5 * _SB, _LANES), jnp.int32),
            pltpu.VMEM((j * gsz, _LANES), jnp.int32),
        ],
        interpret=interpret,
    )(wt, wt, wv3, fi3)

    def meta_rows(i):
        return meta[:, i * _SB : (i + 1) * _SB, :].reshape(
            blocks * bseg
        )[:rows]

    return plane_t, meta_rows(0), meta_rows(1), meta_rows(2), meta_rows(3)


def _local_width(n_samples: int, parts: int) -> int:
    """Static per-sub-block output width: mean local count + slack for
    count fluctuations (word-uniform splits give sample counts within a
    few percent of the mean for stationary data). Skewed streams whose
    sub-block counts overrun it are flagged for exact re-decode."""
    mean = -(-n_samples // parts)
    return -(-(mean + max(mean // 8, 192)) // 128) * 128


@functools.partial(jax.jit, static_argnums=(7, 8, 9, 10, 11))
def _compose_merge(local: jnp.ndarray, ent, ext, nloc, accf, wv2, nv,
                   n_samples: int, parts: int, lw: int, delta: bool,
                   interpret: bool = False):
    """Junction checks + count/delta chaining + ragged row merge.

    local: (nseg*parts, lw) int16 per-sub-block dense samples.
    nv: (nseg,) true sample counts (short leftover segments decode
    fewer than ``n_samples``; their padded tail is garbage, as the
    serial kernel's — callers slice by true counts).
    Returns ((nseg, n_samples) int16, (nseg,) bool bad flags).
    """
    nseg = local.shape[0] // parts
    e2 = ent.reshape(nseg, parts)
    x2 = ext.reshape(nseg, parts)
    n2 = nloc.reshape(nseg, parts)
    a2 = accf.reshape(nseg, parts)
    # junction check: speculated entry phase must equal the predecessor's
    # exit phase (skip junctions into empty sub-blocks — the empty suffix
    # of a segment shorter than parts*wsub words)
    okj = (e2[:, 1:] == x2[:, :-1]) | (wv2[:, 1:] == 0)
    bad = ~jnp.all(okj, axis=1)
    n_off = jnp.cumsum(n2, axis=1) - n2
    # true samples per sub-block: phantoms (zero-fill decodes in the last
    # nonempty sub-block) sit past the segment's count and clip off here
    n_eff = jnp.clip(nv[:, None] - n_off, 0, n2)
    bad |= jnp.sum(n_eff, axis=1) != nv
    bad |= jnp.any(n_eff > lw, axis=1)
    v = local.reshape(nseg, parts, lw).astype(jnp.int32)
    if delta:
        # entry delta state of sub-block p = last true sample of p-1 =
        # exclusive wrapping prefix of the local final values; the add
        # fuses into the merge plane build below (one XLA pass total)
        aoff = jnp.cumsum(a2, axis=1) - a2
        v = v + aoff[:, :, None]
    # ragged row-concat as ONE wide16 concentration: displacement is a
    # per-sub-block constant (p*lw - n_off[p]); everything elementwise
    # fuses into the single sign-biased plane build
    i = jax.lax.broadcasted_iota(jnp.int32, (nseg, parts, lw), 2)
    p_i = jax.lax.broadcasted_iota(jnp.int32, (nseg, parts, lw), 1)
    dispc = p_i * lw - n_off[:, :, None]
    keep = ((i < n_eff[:, :, None]) & (dispc >= 0)
            & (dispc < (1 << 16) - 1))
    # a true displacement past the 16-bit field only happens when counts
    # skew far from uniform; those segments re-decode exactly
    bad |= jnp.any((i < n_eff[:, :, None]) & ~keep, axis=(1, 2))
    plane = jnp.where(
        keep, ((dispc << 16) | (v & 0xFFFF)) ^ _DEAD, _DEAD
    )
    from .concentrate_pallas import concentrate_wide16_plane

    out = concentrate_wide16_plane(
        plane.reshape(nseg, parts * lw), n_samples, (1 << 16) - 1,
        interpret,
    )
    return ((out << 16) >> 16).astype(jnp.int16), bad


def decode_split_parts(nseg: int, wmax: int, k: int,
                       j_svc: int | None = None) -> int:
    """Sub-blocks per segment for the split decode (1 = don't split).

    Split when it either fills the 1024-lane grid (small batches of long
    segments) or brings the per-row slot axis into the packed
    concentration plane's 15-bit displacement regime (any batch of long
    segments, which otherwise ride the heavier wide-displacement
    kernels). ``j_svc`` is the service rate the NON-split path would
    use (:func:`...codec._service_hint`): when that path is already
    packed-eligible with a full lane grid — short segments, or
    escape-heavy streams whose reduced service rate shrinks the slot
    axis — splitting buys nothing and costs the merge. The word budget
    per sub-block must keep the plane displacement bound under 2**15
    (at the worst-case halo) and stay worth a lane (>= 256 words).
    """
    j = codewords_per_word(k)
    if wmax * (j_svc or j) < (1 << 15) and nseg >= _SB * _LANES:
        return 1  # non-split path already packed-eligible, lanes full
    wc = _chunk_words(j)
    for parts in (2, 4, 8, 16, 32, 64):
        wsub = -(-wmax // parts)
        if wsub < 256 or nseg * parts > (1 << 14):
            return 1
        width = -(-(_HALO_MAX + wsub + _TAIL) // wc) * wc
        if (nseg * parts >= _SB * _LANES
                and (width - 1) * (j - 1) + _HALO_MAX + j < (1 << 15)
                and width * j < (1 << 15)):
            return parts
    return 1


def unpack_decode_split(words: jnp.ndarray, counts: np.ndarray,
                        n_samples: int, k: int, delta: bool, parts: int,
                        nvalid: np.ndarray | None = None,
                        interpret: bool = False):
    """Split-decode per-segment Rice streams (see module docstring).

    words: (nseg, W) uint32 padded streams (>= 1 zero pad word per row).
    counts: (nseg,) true word counts from the header walk.
    nvalid: (nseg,) true sample counts (default: ``n_samples`` each;
      a chunk's short leftover segment holds fewer).
    Returns ((nseg, n_samples) int16, (nseg,) bool bad) — flagged
    segments' outputs are invalid and must be re-decoded exactly (the
    caller's existing ``_redecode_bad_rows`` contract).
    """
    from .concentrate_pallas import concentrate_tiled
    from .unpack_pallas import _fit_cols, untile_rows

    nseg, w_in = words.shape
    j = codewords_per_word(k)
    counts = np.asarray(counts, dtype=np.int64)
    wmax = int(counts.max(initial=1))
    wsub = -(-wmax // parts)
    halo = _halo_words(n_samples / max(float(counts.mean()), 1.0))
    width = halo + wsub + _TAIL
    wc = _chunk_words(j)
    w_pad = -(-width // wc) * wc
    # the packed plane's 15-bit displacement field bounds both the slot
    # axis and the worst displacement; :func:`decode_split_parts` only
    # selects parts that satisfy this
    assert (w_pad - 1) * (j - 1) + halo + j < (1 << 15) and (
        w_pad * j < (1 << 15)
    ), "parts too small for this stream's word count"
    rows = nseg * parts

    # uniform word-offset sub-block windows: row (s, p) holds words
    # [p*wsub - halo, p*wsub + wsub + tail) of segment s (zeros outside).
    # Each window is a contiguous wq range; build them as one disjoint
    # body reshape (free-ish: a single large copy) plus a stack of tiny
    # overlapping heads — 4x cheaper than stacking P full windows.
    pw = parts * wsub + _TAIL
    wq = jnp.pad(words, ((0, 0), (halo, max(0, pw - w_in))))
    head_w = halo + _TAIL
    body = wq[:, head_w : head_w + parts * wsub].reshape(
        nseg, parts, wsub
    )
    head = jnp.stack(
        [wq[:, p * wsub : p * wsub + head_w] for p in range(parts)],
        axis=1,
    )
    subs = jnp.concatenate([head, body], axis=2).reshape(rows, width)
    wv2 = np.clip(
        counts[:, None] - np.arange(parts, dtype=np.int64)[None, :] * wsub,
        0, wsub,
    ).astype(np.int32)
    first = np.zeros((nseg, parts), np.int32)
    first[:, 0] = 1

    plane_t, ent, ext, nloc, accf = _split_kernel_program(
        subs, jnp.asarray(wv2.reshape(-1)), jnp.asarray(first.reshape(-1)),
        k, delta, halo, j, interpret,
    )
    # per-sub-block compaction in the kernel's own tiled layout (no
    # staging-plane transpose), then untile the much smaller output
    n_chunks = -(-width // wc)
    bound = (n_chunks * wc - 1) * (j - 1) + halo + j
    lw = _local_width(n_samples, parts)
    out_t = concentrate_tiled((plane_t,), lw, _SB, bound, "int16",
                              interpret)
    local = _fit_cols(untile_rows(out_t, rows, _SB, interpret), lw)
    nv = (np.full(nseg, n_samples, np.int64) if nvalid is None
          else np.asarray(nvalid, dtype=np.int64))
    return _compose_merge(local, ent, ext, nloc, accf, jnp.asarray(wv2),
                          jnp.asarray(nv.astype(np.int32)), n_samples,
                          parts, lw, delta, interpret)
