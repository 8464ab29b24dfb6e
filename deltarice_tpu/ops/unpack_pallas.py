"""Pallas TPU decode kernel: word-synchronous parallel Rice decoding.

The reference decoder walks a serial bit cursor per waveform
(``decompressWithRiceCoding``, ``/root/reference/src/deltaRice.c:138-189``);
its only parallelism is OpenMP across waveforms. A literal port (one
``lax.scan`` step per sample) pays per-step dispatch overhead ~4500x the
ALU cost. This kernel re-derives decode as a TPU program:

* **Lanes x sublanes = segments.** Up to 1024 independent bitstreams decode
  in lockstep: 128 on vector lanes and ``sb`` (<= 8) interleaved on
  sublanes, so every VPU op advances ``sb*128`` serial decode chains at
  once — the serial dependency (each codeword's position depends on all
  previous lengths) is amortized across the batch instead of fought.
* **Word-synchronous loop.** Codewords are <= 25 bits < 32, so a codeword's
  start offset within its word is always in [0, 25) and every uint32 word
  contains 1..J codeword starts, ``J = ceil(32/(k+1))``. The kernel walks
  *words* (not samples), decoding J codewords per word from the 64-bit
  window (w[t], w[t+1]) with a statically unrolled inner loop.
* **Static, aligned VMEM addressing only.** Dynamic row indexing in Mosaic
  costs ~1.3 us per access and unaligned dynamic stores don't compile, so
  decoded values land in a statically-addressed scratch buffer and move to
  the output in one aligned bulk store per (word-group, j). There are no
  gathers or scatters in the kernel.
* **W-chunked sequential grid.** The word axis is split into chunks; grid
  position (block, chunk) runs chunks innermost and carries (bit offset,
  sample count, prefix accumulator) across chunks in VMEM scratch, so
  arbitrarily long streams fit VMEM.
* **Fused post-processing.** Un-zigzag and the wrapping-int16 delta prefix
  sum run inside the inner loop (decode order per lane is sample order), so
  the kernel emits final samples, not intermediate codes.
* **Staging + concentration compaction.** Word t's j-th decoded sample
  lands at staging row t*J + j (t-major), so valid slots' sample indices
  strictly increase along the slot axis; the dense output is then packed
  by butterfly concentration (:mod:`.concentrate_pallas`) — no gathers
  (~56 Melem/s on TPU), no scatters, no sort. When every displacement
  fits the packed plane's 15-bit field (bound: each word holds >= 1
  codeword start, so disp <= (W-1)*(J-1)), the kernel computes
  ``disp = slot - n`` in-register and emits the butterfly's
  ``disp << 16 | sample`` plane directly — no count table, no XLA
  displacement build. Wider word axes emit (sample, count-table) staging
  and route through the blocked two-plane wide kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_U32 = jnp.uint32
_LANES = 128
_GROUP = 16  # words per inner unrolled group
_DEAD = -(1 << 31)  # dead slot marker of the packed concentration planes


def codewords_per_word(k: int) -> int:
    """Max codeword starts in one 32-bit word: min codeword is k+1 bits."""
    return min(-(-32 // (k + 1)), 32)


def _sublane_factor(nseg: int) -> int:
    """Segments-per-lane-row batching. Always 8 (a full (8, 128) vreg):
    block time is bound by the serial decode chain's op latency, which is
    independent of the sublane width, so padding small batches up to 1024
    segments costs (almost) nothing while keeping every VMEM slice
    8-row-aligned."""
    del nseg
    return 8


def _chunk_words(k: int, sb: int) -> int:
    """Words per grid chunk, sized so the staging block stays ~2 MB."""
    j_max = codewords_per_word(k)
    wc = 16
    while wc * 2 * j_max * sb <= 8192:
        wc *= 2
    return wc


def _decode_one(w0, w1, pos, k: int):
    """Decode the codeword at bit ``pos`` (< 32) of the window (w0, w1).

    Returns (u zigzag value i32, clen i32); valid only where pos < 32.
    The ``(w1 >> (31-p)) >> 1`` form avoids a select for p == 0 (where a
    single >>32 would be undefined), shortening the loop-carried
    dependency chain pos -> win -> q -> clen -> pos.
    """
    p = (pos & 31).astype(_U32)
    win = (w0 << p) | ((w1 >> (_U32(31) - p)) >> 1)
    top8 = win >> _U32(24)
    q = jnp.zeros(pos.shape, jnp.int32)
    for b in range(8):
        q = q + (top8 < _U32(1 << b)).astype(jnp.int32)
    esc = q == 8
    rsh = (jnp.int32(31 - k) - q).astype(_U32) & _U32(31)
    rbits = (win >> rsh) & _U32((1 << k) - 1)
    u_plain = (q.astype(_U32) << k) | rbits
    u_esc = (win >> _U32(7)) & _U32(0xFFFF)
    u = jnp.where(esc, u_esc, u_plain).astype(jnp.int32)
    # q+1+k for q<8, 25 for the escape: 25 = 8+1+16, so add (16-k) when esc
    clen = q + (1 + k) + jnp.where(esc, 16 - k, 0)
    return u, clen


def _unpack_kernel(words_ref, next_ref, stage_ref, ntab_ref, carry_ref,
                   scratch_ref, *, wc: int, k: int, delta: bool, sb: int,
                   packed: bool, n_samples: int):
    """One grid step: decode ``wc`` words of sb*128 segments.

    words_ref: (wc*sb, 128) uint32 — row t*sb+s is word t of sublane-group s.
    next_ref:  (GROUP*sb, 128) uint32 — first words of the next chunk.
    stage_ref: (J*wc*sb, 128) — row (t*J + j)*sb + s (t-major); int16
               sample, or with ``packed`` the int32 concentration plane
               ``disp << 16 | sample-halfword`` (dead = INT32_MIN).
    ntab_ref:  (wc*sb, 128) int32 — samples decoded before word t
               (absent in ``packed`` mode, where the kernel computes the
               displacement itself and no host-side table is needed).
    carry_ref: (3*sb, 128) int32 scratch — pos / n / acc across chunks.
    scratch_ref: (J*GROUP*sb, 128) int32 scratch — staging for one group.
    """
    j_max = codewords_per_word(k)
    c = pl.program_id(1)

    @pl.when(c == 0)
    def _():
        carry_ref[:, :] = jnp.zeros_like(carry_ref)

    pos = carry_ref[0:sb, :]
    n = carry_ref[sb : 2 * sb, :]
    acc = carry_ref[2 * sb : 3 * sb, :]
    assert sb == 8, "kernel layout assumes 8-sublane interleaving"

    n_groups = wc // _GROUP
    gsz = _GROUP * sb

    def group_step(g, carry):
        pos, n, acc = carry
        row0 = pl.multiple_of(g * gsz, gsz)
        cur = words_ref[pl.ds(row0, gsz), :]
        # first word of the next group: within this chunk for g < last,
        # else the first word of the next chunk
        within = words_ref[
            pl.ds(pl.multiple_of(jnp.minimum(g + 1, n_groups - 1) * gsz,
                                 gsz), sb), :
        ]
        nxt0 = jnp.where(g + 1 < n_groups, within, next_ref[0:sb, :])
        ntab_vals = []
        for tt in range(_GROUP):
            w0 = cur[tt * sb : (tt + 1) * sb, :]
            w1 = (
                cur[(tt + 1) * sb : (tt + 2) * sb, :]
                if tt + 1 < _GROUP
                else nxt0
            )
            if not packed:
                ntab_vals.append(n)
            for j in range(j_max):
                active = pos < 32
                u, clen = _decode_one(w0, w1, pos, k)
                x = (u >> 1) ^ -(u & 1)  # un-zigzag
                if delta:
                    s = ((acc + x) << 16) >> 16  # wrapping int16 prefix sum
                    acc = jnp.where(active, s, acc)
                    out = acc
                else:
                    out = x
                # t-major staging: slot (t, j) at row t*J + j, so valid
                # slots' sample indices strictly increase along rows — the
                # precondition for butterfly-concentration compaction
                if packed:
                    slot = (c * wc + g * _GROUP + tt) * j_max + j
                    valid = active & (n < n_samples)
                    scratch_ref[(tt * j_max + j) * sb : (tt * j_max + j + 1) * sb, :] = (
                        jnp.where(valid, ((slot - n) << 16) | (out & 0xFFFF),
                                  _DEAD)
                    )
                else:
                    scratch_ref[(tt * j_max + j) * sb : (tt * j_max + j + 1) * sb, :] = (
                        jnp.where(active, out, 0)
                    )
                pos = jnp.where(active, pos + clen, pos)
                n = n + active.astype(jnp.int32)
            pos = pos - 32
        stage_ref[pl.ds(pl.multiple_of(row0 * j_max, gsz), gsz * j_max), :] = (
            scratch_ref[0 : gsz * j_max, :].astype(stage_ref.dtype)
        )
        if not packed:
            ntab_ref[pl.ds(row0, gsz), :] = jnp.concatenate(ntab_vals, axis=0)
        return pos, n, acc

    pos, n, acc = jax.lax.fori_loop(
        0, n_groups, group_step, (pos, n, acc)
    )
    carry_ref[0:sb, :] = pos
    carry_ref[sb : 2 * sb, :] = n
    carry_ref[2 * sb : 3 * sb, :] = acc


@functools.partial(jax.jit, static_argnums=(1, 2, 3, 4))
def unpack_decode_pallas(words: jnp.ndarray, n_samples: int, k: int,
                         delta: bool = True, interpret: bool = False):
    """Decode per-segment Rice streams to samples on TPU, as ONE program:
    Mosaic kernel -> layout transposes -> concentration compaction. (The
    pipeline is fusion-safe because it contains no gathers; an earlier
    gather-based compaction had to live in its own dispatch.)

    Args:
      words: (num_segments, W) uint32, one stream per row, zero-padded
        past each stream's true words.
      n_samples: samples to decode per segment.
      k: log2(M).
      delta: fuse the [1,-1] inverse (prefix sum); otherwise return the
        un-zigzagged pre-filter values for a generic-filter inverse outside.

    Returns:
      (num_segments, n_samples) int16.
    """
    nseg = words.shape[0]
    sb = _sublane_factor(nseg)
    wc = _chunk_words(k, sb)
    j_max = codewords_per_word(k)
    n_chunks = -(-words.shape[1] // wc)
    # packed-plane emission needs every displacement to fit the plane's
    # 15-bit field. Every word contains >= 1 codeword start (pos < 32 at
    # each word boundary), so slot (t, j)'s destination n(t)+j satisfies
    # n(t) >= t and disp = t*j_max - n(t) <= (W-1)*(j_max-1).
    if (n_chunks * wc - 1) * (j_max - 1) < (1 << 15):
        from .concentrate_pallas import concentrate_packed

        plane = _kernel_program(
            words, k, delta, sb, wc, interpret, n_samples
        )
        out = concentrate_packed((plane,), n_samples, wide=False)
        return ((out << 16) >> 16).astype(jnp.int16)
    stage, ntab = _kernel_program(words, k, delta, sb, wc, interpret)
    return _compaction(stage, ntab, n_samples, wc, j_max)


@functools.partial(jax.jit, static_argnums=(1, 2, 3, 4, 5, 6))
def _kernel_program(words: jnp.ndarray, k: int, delta: bool, sb: int,
                    wc: int, interpret: bool = False,
                    packed_n_samples: int | None = None):
    """Run the decode kernel. With ``packed_n_samples`` set the kernel
    emits one int32 packed concentration plane (``disp << 16 | sample``);
    otherwise an int16 sample plane plus the per-word ``ntab`` count
    table for the XLA displacement build in :func:`_compaction`."""
    from .transpose_pallas import transpose2d

    nseg, w_in = words.shape
    j_max = codewords_per_word(k)
    bseg = sb * _LANES
    blocks = -(-nseg // bseg)
    n_chunks = -(-w_in // wc)
    packed = packed_n_samples is not None
    # pad: one whole extra chunk of zero words for the next_ref window
    cols = (n_chunks + 1) * wc
    words = jnp.pad(words, ((0, blocks * bseg - nseg), (0, cols - w_in)))

    # (S, cols) -> (blocks, cols*sb, 128) with row t*sb + s, lane l for
    # segment (block, s*128 + l)
    w3 = words.reshape(blocks, bseg, cols)
    wt = jax.vmap(transpose2d)(w3)  # (blocks, cols, bseg)
    wt = wt.reshape(blocks, cols, sb, _LANES).reshape(
        blocks, cols * sb, _LANES
    )

    kern = functools.partial(
        _unpack_kernel, wc=wc, k=k, delta=delta, sb=sb, packed=packed,
        n_samples=packed_n_samples if packed else 0,
    )
    if packed:
        # single output: the kernel computes displacements itself, so no
        # ntab table and no XLA displacement pass exist downstream
        def kern_packed(words_ref, next_ref, stage_ref, carry_ref,
                        scratch_ref):
            kern(words_ref, next_ref, stage_ref, None, carry_ref,
                 scratch_ref)

        body = kern_packed
    else:
        body = kern
    gsz = _GROUP * sb
    stage_spec = pl.BlockSpec((None, j_max * wc * sb, _LANES),
                              lambda b, c: (b, c, 0),
                              memory_space=pltpu.VMEM)
    stage_shape = jax.ShapeDtypeStruct(
        (blocks, n_chunks * j_max * wc * sb, _LANES),
        jnp.int32 if packed else jnp.int16,
    )
    ntab_spec = pl.BlockSpec((None, wc * sb, _LANES), lambda b, c: (b, c, 0),
                             memory_space=pltpu.VMEM)
    ntab_shape = jax.ShapeDtypeStruct(
        (blocks, n_chunks * wc * sb, _LANES), jnp.int32
    )
    out = pl.pallas_call(
        body,
        grid=(blocks, n_chunks),
        in_specs=[
            pl.BlockSpec((None, wc * sb, _LANES), lambda b, c: (b, c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, gsz, _LANES),
                         lambda b, c: (b, (c + 1) * (wc // _GROUP), 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[stage_spec] if packed else [stage_spec, ntab_spec],
        out_shape=[stage_shape] if packed else [stage_shape, ntab_shape],
        scratch_shapes=[
            pltpu.VMEM((3 * sb, _LANES), jnp.int32),
            pltpu.VMEM((j_max * gsz, _LANES), jnp.int32),
        ],
        interpret=interpret,
    )(wt, wt)

    def untile(a):
        # rows (c, j*wc+t_rel, s) with minor (s, lane) -> per-segment rows
        rows = a.shape[1] // sb
        t = jax.vmap(transpose2d)(a.reshape(blocks, rows, bseg))
        return t.reshape(blocks * bseg, rows)[:nseg]

    if packed:
        return untile(out[0])
    return untile(out[0]), untile(out[1])


@functools.partial(jax.jit, static_argnums=(2, 3, 4))
def _compaction(stage: jnp.ndarray, ntab: jnp.ndarray, n_samples: int,
                wc: int, j_max: int):
    """Pack staged samples densely by sample index via butterfly
    concentration.

    Staging column t*J + j (t-major) holds the j-th decode of word t,
    whose sample index is ntab[t] + j (valid iff j < ntab[t+1] - ntab[t]),
    so valid destinations strictly increase along the slot axis — the
    concentration precondition. Everything is built densely by
    broadcasting: no gathers (per-element gathers run ~56 Melem/s on TPU)
    and no sort (~14 shift+select passes instead of ~196 compare-exchange
    passes). Phantom decodes from a stream's zero-padding words get
    destinations >= n_samples and fall off the slice (callers guarantee
    >= 1 trailing pad word per stream); the final staged word's count is
    unknown (no ntab[W]) but it is always such a pad word.
    """
    from .concentrate_pallas import concentrate_pallas

    nseg, n_words = ntab.shape
    nxt = jnp.concatenate(
        [ntab[:, 1:], jnp.full((nseg, 1), 0x7FFFFFFF, jnp.int32)], axis=1
    )
    cnt = nxt - ntab
    # broadcast to t-major staging order (t, j)
    base = jnp.broadcast_to(
        ntab[:, :, None], (nseg, n_words, j_max)
    )
    c_b = jnp.broadcast_to(cnt[:, :, None], (nseg, n_words, j_max))
    j_b = jax.lax.broadcasted_iota(jnp.int32, (nseg, n_words, j_max), 2)
    r = n_words * j_max
    dest = (base + j_b).reshape(nseg, r)
    valid = (j_b < c_b).reshape(nseg, r)
    slot = jnp.arange(r, dtype=jnp.int32)[None, :]
    disp = jnp.where(valid & (dest < n_samples), slot - dest, -1)
    # every word holds >= 1 codeword start, so disp <= (W-1)*(j_max-1);
    # the static bound lets 16-bit samples ride the single-plane kernel
    return concentrate_pallas(stage, disp, n_samples,
                              (n_words - 1) * (j_max - 1))
