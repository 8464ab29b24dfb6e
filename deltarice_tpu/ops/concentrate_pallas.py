"""VMEM-resident butterfly concentration (Pallas TPU kernel).

The XLA butterfly in :mod:`.concentrate` materializes every routing pass
through HBM: ~13 passes x 3 array round-trips ~= 1.3 GB of traffic for the
Nab bench batch, ~1.6-1.9 ms — more than the codec kernels it serves. This
kernel runs ALL passes over a row-block held in VMEM, so HBM sees each
element exactly twice (one read, one write) and the passes run at VPU
speed.

Same routing algorithm (Nassimi-Sahni monotone concentration, LSB-first),
different formulation: each (value, displacement) pair packs into one int32
``disp << 16 | val`` and a pass is

    stay  = (p  & (s << 16)) == 0 ? p            : INT32_MIN
    move  = (sh & (s << 16)) != 0 ? sh - (s<<16) : INT32_MIN
    p'    = max(stay, move)          # conflict-freedom: <= 1 is valid

with ``sh`` the row rolled left by ``s``. Dead slots are INT32_MIN: its
displacement bits are all zero so it permanently "stays", and ``max``
discards it whenever any valid candidate exists — no separate validity
mask. Payloads wider than 16 bits ride as two packed planes (high/low
half-words) sharing one displacement; routing masks are computed once per
pass on the first plane's sentinel-free arithmetic (identical across
planes by construction).

Slot axes >= 2**15 outgrow both the packed 15-bit displacement field and
a VMEM row; they route through :func:`_concentrate_wide` — explicit
(payload, displacement) int32 planes, low-stride passes over 2-block halo
windows, block-stride passes over column stripes — which handles any
displacement < 2**31 and 32-bit payloads without half-word splitting.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE = 128
_DEAD = -(1 << 31)  # int32 min
_VMEM_BUDGET = 12 << 20  # I/O-window sizing target per grid step

#: vd window-sizing budget (bytes). With the Mosaic cap raised to 100
#: MiB the old hardcoded 10 MiB target starved the L2/L3 stripes
#: (rstripe=8 at NOPTREX scale); env knob for A/B sweeps on hardware.
_TVD_BUDGET = int(os.environ.get("DELTARICE_TPU_VD_BUDGET_MB", "10")) << 20

# Mosaic enforces a conservative ~16 MB scoped-VMEM cap by default, but
# the physical VMEM on current TPUs (v4/v5e/v5p) is 128 MiB. The wide
# concentration kernels legitimately hold > 16 MB — pipelined window I/O
# plus the unrolled butterfly's per-pass temporaries (which Mosaic does
# not reuse across the unroll) — so raise the enforced cap with ample
# headroom under the physical size instead of starving the block size.
_VMEM_LIMIT = pltpu.CompilerParams(vmem_limit_bytes=100 << 20)


def _block_rows(rp: int, plane_bytes: int) -> int:
    """Rows per grid step: ~3 live (BS, rp) arrays of ``plane_bytes``
    total bytes/slot must fit VMEM. Clamped to [8, 64] in sublane
    multiples."""
    bs = _VMEM_BUDGET // (rp * 3 * plane_bytes)
    return max(8, min(64, (bs // 8) * 8))


def _conc_kernel(*refs, rp: int, n_planes: int, passes: tuple[int, ...],
                 follower: bool):
    """Butterfly passes over VMEM-resident row blocks.

    ``ins[0]`` is always a packed ``disp << 16 | halfword`` LEADER whose
    bits route every pass. With ``follower`` the second plane is pure
    int16 payload that just follows the leader's move decision — the
    move candidate is live iff its disp bit is set (dead slots' disp
    field is all-zero), and monotone conflict-freedom guarantees at most
    one live candidate per slot, so "a mover exists" decides the select
    without comparing magnitudes.
    """
    ins, outs = refs[:n_planes], refs[n_planes:]
    rows = ins[0].shape[0]
    cols = jax.lax.broadcasted_iota(jnp.int32, (rows, rp), 1)
    planes = [ref[:, :] for ref in ins]
    for b in passes:
        s = 1 << b
        smask = jnp.int32(s << 16)
        edge = cols < (rp - s)  # roll wraps cols >= rp-s; those die
        if follower:
            lead, follow = planes
            sh = jnp.where(edge, pltpu.roll(lead, rp - s, axis=1), _DEAD)
            moved = (sh & smask) != 0
            stay = jnp.where((lead & smask) == 0, lead, _DEAD)
            move = jnp.where(moved, sh - smask, _DEAD)
            # Mosaic's lane rotate only supports 32-bit element types;
            # widen the int16 follower for the roll and narrow back
            fsh = pltpu.roll(follow.astype(jnp.int32), rp - s,
                             axis=1).astype(follow.dtype)
            planes = [jnp.maximum(stay, move),
                      jnp.where(moved, fsh, follow)]
        else:
            nxt = []
            for p in planes:
                # left-roll by s == circular roll by rp - s (pltpu.roll
                # requires a non-negative shift)
                sh = jnp.where(edge, pltpu.roll(p, rp - s, axis=1), _DEAD)
                stay = jnp.where((p & smask) == 0, p, _DEAD)
                move = jnp.where((sh & smask) != 0, sh - smask, _DEAD)
                nxt.append(jnp.maximum(stay, move))
            planes = nxt
    lead_out = planes[0][:, : outs[0].shape[1]]
    alive = lead_out != _DEAD
    outs[0][:, :] = jnp.where(alive, lead_out & 0xFFFF, 0)
    for ref, p in zip(outs[1:], planes[1:]):
        keep = p[:, : ref.shape[1]]
        if follower:
            ref[:, :] = jnp.where(alive, keep, 0).astype(ref.dtype)
        else:
            ref[:, :] = jnp.where(keep == _DEAD, 0, keep & 0xFFFF)


@functools.partial(jax.jit, static_argnums=(1, 2))
def _run(planes: tuple[jnp.ndarray, ...], n_out: int,
         interpret: bool = False):
    rows, r = planes[0].shape
    rp = -(-r // _LANE) * _LANE
    n = len(planes)
    follower = n == 2 and planes[1].dtype == jnp.int16
    bs = _block_rows(rp, sum(p.dtype.itemsize for p in planes))
    rowp = -(-rows // bs) * bs
    # a stream shorter than its segment can stage fewer slots than the
    # requested output; the surplus tail pads with zeros at the end
    n_out_p = min(-(-n_out // _LANE) * _LANE, rp)
    padded = [
        jnp.pad(p, ((0, rowp - rows), (0, rp - r)),
                constant_values=(0 if p.dtype == jnp.int16 else _DEAD))
        for p in planes
    ]
    # the packed-plane format carries a 15-bit displacement (bits 16..30;
    # bit 31 is the dead sentinel's sign), so strides >= 2**15 can never
    # route anything — cap the pass list there. This also keeps the
    # kernel's ``s << 16`` masks inside int32 when the slot axis itself
    # reaches 2**15 (e.g. k=15 decode staging: j_max=2, W up to 2**14).
    passes = tuple(b for b in range(max(1, min(15, (rp - 1).bit_length())))
                   if (1 << b) < rp)
    kern = functools.partial(
        _conc_kernel, rp=rp, n_planes=n, passes=passes, follower=follower
    )
    outs = pl.pallas_call(
        kern,
        grid=(rowp // bs,),
        in_specs=[
            pl.BlockSpec((bs, rp), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
        ] * n,
        out_specs=[
            pl.BlockSpec((bs, n_out_p), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
        ] * n,
        out_shape=[
            jax.ShapeDtypeStruct((rowp, n_out_p), p.dtype)
            for p in planes
        ],
        interpret=interpret,
        compiler_params=_VMEM_LIMIT,
    )(*padded)
    if n_out_p < n_out:
        outs = [jnp.pad(o, ((0, 0), (0, n_out - n_out_p))) for o in outs]
    return [o[:rows, :n_out] for o in outs]


@functools.partial(jax.jit, static_argnums=(1, 2))
def concentrate_packed(planes, n_out: int, wide: bool):
    """Concentrate pre-packed ``disp << 16 | halfword`` planes.

    Producers that already know each element's displacement (the Mosaic
    codec kernels) emit planes in this layout directly, skipping the
    XLA packing pass below — XLA cannot fuse elementwise producers into
    a ``pallas_call``, so that pass costs a full HBM round trip of the
    staging arrays per plane. Dead slots must be ``INT32_MIN``.

    planes: tuple of (rows, R) planes: 1 int32 packed plane for 16-bit
      payloads; for 32-bit payloads the int32 packed LEADER (disp +
      high halfword) plus a pure-int16 FOLLOWER (low halfword) that
      rides the leader's routing — the displacement is stored once and
      half the traffic moves at half width.
    wide: True to reassemble a uint32 payload from the two planes.
    """
    outs = _run(tuple(planes), n_out)
    if wide:
        hi, lo = outs
        return ((hi << 16) | (lo.astype(jnp.int32) & 0xFFFF)).astype(
            jnp.uint32
        )
    return outs[0]


# --- tiled concentration: butterfly passes in the codec kernels' own
# --- layout (row = slot*sb + s), no lane rolls, no untile transposes ----
#
# The Mosaic codec kernels stage (blocks, R*sb, 128) arrays where the
# slot axis lives on ROWS with an sb-way sublane interleave and the 128
# lanes are independent segments. Concentrating in that layout means a
# stride-t butterfly pass is a SUBLANE shift by t*sb rows (a static
# slice — the cheapest data movement the VPU has), where the untiled
# formulation needs full-width lane rolls (cross-lane permutes, the
# dominant cost of :func:`_conc_kernel`) plus a 128x128-tiled transpose
# of the whole staging array on each side. Same two-level decomposition
# as the wide kernels: low strides over 2-block halo windows, then
# block strides over (nbk, rstripe) column stripes.

_TBLK = 256  # tiled-kernel block, in slots (window = 2*_TBLK*sb rows)


def _tconc_finalize(lead, follow, emit: str):
    """Home-select + output formatting shared by the tiled kernels.

    An element has arrived iff its displacement field is zero and it is
    not the dead sentinel — both equivalent to ``lead >> 16 == 0``
    (valid planes keep bit 31 clear; DEAD has it set)."""
    arrived = (lead >> 16) == 0
    half = jnp.where(arrived, lead, 0)
    if emit == "int16":
        return ((half << 16) >> 16).astype(jnp.int16)
    hi = half << 16
    lo = jnp.where(arrived, follow.astype(jnp.int32) & 0xFFFF, 0)
    return (hi | lo).astype(jnp.uint32)


def _tconc_bias_finalize(p, emit: str):
    """Home-select for the sign-biased plane (see :func:`_w16_pass`)."""
    half = _w16_home(p)
    if emit == "int16":
        return ((half << 16) >> 16).astype(jnp.int16)
    return half.astype(jnp.uint32)


def _tconc_low_kernel(*refs, sb: int, follower: bool, emit: str,
                      bias: bool = False):
    """Low-stride passes (1.._TBLK/2 slots) over a 2-block row window.

    Window = rows [j*_TBLK*sb, (j+2)*_TBLK*sb); emits block j. After
    pass b an element of the output block originated < 2^(b+1) <= _TBLK
    slots to the right, so the one-block halo covers every low pass;
    the window's right half degrades pass by pass and is discarded.
    The grid walks blocks RIGHT-TO-LEFT and carries each step's RAW
    block in VMEM scratch, so the halo is the previous step's input —
    every element is read from HBM exactly once instead of twice.
    With ``emit`` != 'planes' this is the final kernel: arrived
    elements are selected and formatted in-register.
    """
    n_in = 2 if follower else 1
    n_out = 2 if (follower and emit == "planes") else 1
    ins = refs[:n_in]
    outs = refs[n_in : n_in + n_out]
    scr = refs[n_in + n_out :]
    jj = pl.program_id(1)

    @pl.when(jj == 0)
    def _():
        scr[0][:, :] = jnp.full_like(scr[0], _DEAD)
        if follower:
            scr[1][:, :] = jnp.zeros_like(scr[1])

    raw_lead = ins[0][:, :]
    lead = jnp.concatenate([raw_lead, scr[0][:, :]], axis=0)
    if follower:
        raw_fol = ins[1][:, :]
        follow = jnp.concatenate([raw_fol, scr[1][:, :]], axis=0)
    else:
        follow = None
    rows = lead.shape[0]
    for b in range(_TBLK.bit_length() - 1):
        rshift = (1 << b) * sb
        dead = jnp.full((rshift, lead.shape[1]), _DEAD, jnp.int32)
        sh = jnp.concatenate([lead[rshift:], dead], axis=0)
        if bias:
            lead = _w16_pass(lead, sh, b)
            continue
        smask = jnp.int32(1 << (16 + b))
        stay = jnp.where((lead & smask) == 0, lead, _DEAD)
        move = jnp.where((sh & smask) != 0, sh - smask, _DEAD)
        if follower:
            moved = (sh & smask) != 0
            fsh = jnp.concatenate(
                [follow[rshift:], jnp.zeros((rshift, follow.shape[1]),
                                            follow.dtype)], axis=0
            )
            follow = jnp.where(moved, fsh, follow)
        lead = jnp.maximum(stay, move)
    keep = rows // 2
    if emit == "planes":
        outs[0][:, :] = lead[:keep]
        if follower:
            outs[1][:, :] = follow[:keep]
    elif bias:
        outs[0][:, :] = _tconc_bias_finalize(lead[:keep], emit)
    else:
        outs[0][:, :] = _tconc_finalize(
            lead[:keep], follow[:keep] if follower else None, emit
        )
    scr[0][:, :] = raw_lead
    if follower:
        scr[1][:, :] = raw_fol


def _tconc_high_kernel(*refs, passes: int, lb: int, follower: bool,
                       emit: str, nbk_out: int, bias: bool = False):
    """Block-stride passes + final select over a (nbk, rstripe) stripe.

    After the low sweep every remaining displacement is a multiple of
    _TBLK, so elements only move whole blocks at a fixed within-block
    row — i.e. along axis 0 of the (nbk, bslots*sb, lanes) view, which
    this kernel walks entirely in VMEM with static axis-0 shifts.
    """
    ins, outs = refs[: 2 if follower else 1], refs[2 if follower else 1:]
    lead = ins[0][:, :, :]
    follow = ins[1][:, :, :] if follower else None
    for h in range(passes):
        s = 1 << h
        dead = jnp.full((s,) + lead.shape[1:], _DEAD, jnp.int32)
        sh = jnp.concatenate([lead[s:], dead], axis=0)
        if bias:
            lead = _w16_pass(lead, sh, lb + h)
            continue
        smask = jnp.int32(1 << (16 + lb + h))
        stay = jnp.where((lead & smask) == 0, lead, _DEAD)
        move = jnp.where((sh & smask) != 0, sh - smask, _DEAD)
        if follower:
            moved = (sh & smask) != 0
            fsh = jnp.concatenate(
                [follow[s:], jnp.zeros((s,) + follow.shape[1:],
                                       follow.dtype)], axis=0
            )
            follow = jnp.where(moved, fsh, follow)
        lead = jnp.maximum(stay, move)
    if bias:
        outs[0][:, :, :] = _tconc_bias_finalize(lead[:nbk_out], emit)
    else:
        outs[0][:, :, :] = _tconc_finalize(
            lead[:nbk_out], follow[:nbk_out] if follower else None, emit
        )


@functools.partial(jax.jit, static_argnums=(1, 2, 3, 4, 5, 6))
def concentrate_tiled(planes, n_out: int, sb: int, disp_bound: int,
                      emit: str = "int16", interpret: bool = False,
                      bias: bool = False):
    """Concentrate packed planes in the codec kernels' TILED layout.

    planes: 1 or 2 arrays of shape (blocks, R*sb, lanes); row slot*sb+s
      of block b holds slot ``slot`` of segment (b, s*lanes + lane).
      planes[0] is the int32 packed leader ``disp << 16 | halfword``
      (dead = INT32_MIN, disp < 2**15); planes[1], if present, an int16
      follower routed by the leader's bits. With ``bias`` the single
      plane is instead the sign-biased ``(disp << 16 | half) ^ 2**31``
      of :func:`_w16_pass` (disp < 2**16; dead = INT32_MIN), extending
      the displacement range to 16 bits — nEDM-scale decode staging.
    n_out: output slots per segment.
    disp_bound: static displacement bound; prunes block-stride passes.
    emit: 'int16' — sign-extended halfword samples (decode);
          'u32'  — ``leader_half << 16 | follower_half`` words (encode).

    Returns (blocks, n_out_blocks*sb, lanes) in the same tiled layout
    with ``n_out_blocks = ceil(min(n_out, slots)/_TBLK)*_TBLK >= the
    covered slots`` — callers untile AFTER (the transpose then runs at
    output width/dtype instead of staging width) and slice/pad columns
    to ``n_out`` segment-major, where it's free (the transpose slices
    and XLA pads fuse). Slots past a segment's staged range are zero.
    """
    lead = planes[0]
    follower = len(planes) == 2
    assert not (bias and follower), "biased planes carry no follower"
    blocks, rows, lanes = lead.shape
    r = rows // sb
    nbk = -(-r // _TBLK)
    lb = _TBLK.bit_length() - 1
    hp = 0
    while (_TBLK << hp) <= disp_bound and (1 << hp) < nbk:
        hp += 1
    n_out_slots = min(n_out, nbk * _TBLK)
    nbk_out = -(-n_out_slots // _TBLK)
    brows = _TBLK * sb
    # pad the slot axis to whole blocks (the right halo of the last block
    # is the kernel's scratch init, not a stored block)
    pad = ((0, 0), (0, nbk * brows - rows), (0, 0))
    lead = jnp.pad(lead, pad, constant_values=_DEAD)
    ins = [lead]
    if follower:
        ins.append(jnp.pad(planes[1], pad))
    low_emit = "planes" if hp else emit
    low_nbk = nbk if hp else nbk_out
    # the grid walks blocks right-to-left (the kernel carries each raw
    # block as the next step's halo); emitted blocks clamp to the output
    # range — steps right of it write (and overwrite) its last block,
    # whose final (leftmost) visit is the correct one
    blk_in = pl.BlockSpec(
        (None, brows, lanes), lambda b, j: (b, nbk - 1 - j, 0),
        memory_space=pltpu.VMEM,
    )
    blk_out = pl.BlockSpec(
        (None, brows, lanes),
        lambda b, j: (b, jnp.minimum(nbk - 1 - j, low_nbk - 1), 0),
        memory_space=pltpu.VMEM,
    )
    in_specs = [blk_in] * len(ins)
    if low_emit == "planes":
        out_specs = [blk_out] * len(ins)
        out_shapes = [
            jax.ShapeDtypeStruct((blocks, low_nbk * brows, lanes),
                                 jnp.int32)
        ] + ([jax.ShapeDtypeStruct((blocks, low_nbk * brows, lanes),
                                   jnp.int16)] if follower else [])
    else:
        odt = jnp.int16 if emit == "int16" else jnp.uint32
        out_specs = [blk_out]
        out_shapes = [
            jax.ShapeDtypeStruct((blocks, low_nbk * brows, lanes), odt)
        ]
    scratch = [pltpu.VMEM((brows, lanes), jnp.int32)]
    if follower:
        scratch.append(pltpu.VMEM((brows, lanes), jnp.int16))
    low = pl.pallas_call(
        functools.partial(_tconc_low_kernel, sb=sb, follower=follower,
                          emit=low_emit, bias=bias),
        grid=(blocks, nbk),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=scratch,
        interpret=interpret,
        compiler_params=_VMEM_LIMIT,
    )(*ins)
    if not isinstance(low, (list, tuple)):
        low = [low]
    if hp:
        v3 = [a.reshape(blocks, nbk, brows, lanes) for a in low]
        # stripe rows: whole stripe set x nbk blocks must fit VMEM
        rstripe = 512
        per_row = nbk * lanes * (6 if follower else 4) * 2
        while rstripe > 16 and rstripe * per_row > (4 << 20):
            rstripe //= 2
        while brows % rstripe:
            rstripe //= 2
        odt = jnp.int16 if emit == "int16" else jnp.uint32
        stripe = lambda nb: pl.BlockSpec(  # noqa: E731
            (None, nb, rstripe, lanes), lambda b, t: (b, 0, t, 0),
            memory_space=pltpu.VMEM,
        )
        out = pl.pallas_call(
            functools.partial(_tconc_high_kernel, passes=hp, lb=lb,
                              follower=follower, emit=emit,
                              nbk_out=nbk_out, bias=bias),
            grid=(blocks, brows // rstripe),
            in_specs=[stripe(nbk)] * len(v3),
            out_specs=stripe(nbk_out),
            out_shape=jax.ShapeDtypeStruct(
                (blocks, nbk_out, brows, lanes), odt
            ),
            interpret=interpret,
            compiler_params=_VMEM_LIMIT,
        )(*v3).reshape(blocks, nbk_out * brows, lanes)
    else:
        out = low[0]
    return out


# --- tiled concentration with wide displacements: the vd family ------
#
# NOPTREX-scale decode staging (~10^6 slots per 500k-sample segment)
# carries displacements up to ~R - n_samples ~ 2^19 — past both packed
# plane formats at slot resolution — so L1 runs on explicit planes
# (int16 payload + int32 displacement, dead = -1) and the butterfly
# spans up to three VMEM levels, every pass still a sublane shift:
#   L1  strides 1.._TBLK/2 slots      — multi-block halo-carry windows
#                                       (_TVD_NW blocks + 1 carry block:
#                                       the halo costs 1/NW extra work
#                                       instead of the 2x a one-block
#                                       window pays)
#   L2  strides _TBLK.._TBLK*WB/2     — 2-window halos over the block
#                                       axis of a (nbk, rstripe) view
#   L3  strides _TBLK*WB and up       — one stripe holds every
#                                       super-block (small axis)
# After L1 every surviving displacement is a multiple of _TBLK, and the
# vd router only admits slot axes <= 2**21, so disp >> log2(_TBLK) <
# 2**13 ALWAYS fits the packed plane's 15-bit field: L1 emits one packed
# ``(disp >> 8) << 16 | halfword`` plane and L2/L3 run the ~2x-cheaper
# single-plane max-butterfly (as the packed kernels do) instead of
# two-plane select chains. Measured on v5e (NOPTREX decode staging,
# (1, 1286144, 128) sb=2, bound 562681): 32.6 ms two-plane three-level
# -> see docs/Performance.md for the current number.
# The untiled wide kernels (_concentrate_wide/_wide16) remain for
# segment-major callers; this path serves the decode kernel's native
# tiled staging without untile transposes or lane rolls.

_TVD_WB = 128  # L2 window, in _TBLK-blocks (covers strides < _TBLK*WB)
#: L1 blocks per window; the +1 carry block is amortized over all of
#: them. VMEM-bounded: window ~ (NW+1)*_TBLK*sb*128 slots x ~6 B plus
#: the unrolled passes' temporaries.
_TVD_NW = int(os.environ.get("DELTARICE_TPU_VD_NW", "4"))


def _packed_pass(p, sh, bit: int):
    """One max-butterfly pass on a packed ``disp<<16|val`` plane."""
    smask = jnp.int32(1 << (16 + bit))
    stay = jnp.where((p & smask) == 0, p, _DEAD)
    move = jnp.where((sh & smask) != 0, sh - smask, _DEAD)
    return jnp.maximum(stay, move)


def _tvd_low_kernel(v_ref, d_ref, out_ref, *scr, sb: int, final: bool,
                    nw: int):
    """L1: strides 1.._TBLK/2 over multi-block halo-carry row windows.

    Window = ``nw`` raw blocks + the previous (right) window's first
    block as carry halo; low passes shift at most _TBLK/2*sb rows, so
    one carry block covers them all.

    The passes run on two INT32 planes: a packed leader
    ``A = (disp & (_TBLK-1)) << 16 | halfword`` whose low-displacement
    bits route via the max-butterfly, and a follower ``B = disp >> lb``
    carrying the high displacement bits (the butterfly only subtracts
    SET bits, so the low/high split never borrows). Two birds: the pass
    costs drop from ~11 mixed-dtype ops/slot to ~8 int32 ops, and int16
    disappears from the shift slices entirely — Mosaic miscompiles
    sublane-shifted int16 (and, at nw >= 4 window heights, lazily
    concatenated int32) operands, so the window planes are also
    MATERIALIZED into tall scratches instead of
    ``jnp.concatenate([raw, carry])``. Both found by hardware
    validation; interpret mode executes the lazy forms correctly and
    never sees them.

    When not final, emits ONE packed ``B << 16 | halfword`` plane for
    the single-plane L2/L3 passes (disp is a multiple of _TBLK here,
    and the vd router admits slot axes <= 2**21, so B < 2**13 always
    fits the 15-bit field).
    """
    big_a, big_b = scr
    j = pl.program_id(1)
    wrows = v_ref.shape[0]
    brows = wrows // nw
    lb = _TBLK.bit_length() - 1

    raw_d = d_ref[:, :]
    raw_a = jnp.where(
        raw_d >= 0,
        ((raw_d & (_TBLK - 1)) << 16)
        | (v_ref[:, :].astype(jnp.int32) & 0xFFFF),
        _DEAD,
    )
    raw_b = raw_d >> lb

    @pl.when(j == 0)
    def _():
        big_a[wrows:, :] = jnp.full_like(big_a[wrows:, :], _DEAD)
        big_b[wrows:, :] = jnp.zeros_like(big_b[wrows:, :])

    big_a[:wrows, :] = raw_a
    big_b[:wrows, :] = raw_b
    a = big_a[:, :]
    bb = big_b[:, :]
    for b in range(lb):
        n = (1 << b) * sb
        dead = jnp.full((n, a.shape[1]), _DEAD, jnp.int32)
        sha = jnp.concatenate([a[n:], dead], axis=0)
        shb = jnp.concatenate(
            [bb[n:], jnp.zeros((n, bb.shape[1]), jnp.int32)], axis=0
        )
        smask = jnp.int32(1 << (16 + b))
        moved = (sha & smask) != 0
        stay = jnp.where((a & smask) == 0, a, _DEAD)
        a = jnp.maximum(stay, jnp.where(moved, sha - smask, _DEAD))
        bb = jnp.where(moved, shb, bb)
    if final:
        # low_final implies disp_bound < _TBLK, so B == 0 for all valid
        # elements and A's field alone decides arrival
        out_ref[:, :] = _tconc_finalize(a[:wrows], None, "int16")
    else:
        out_ref[:, :] = jnp.where(
            a[:wrows] == _DEAD, _DEAD,
            (bb[:wrows] << 16) | (a[:wrows] & 0xFFFF),
        )
    big_a[wrows:, :] = raw_a[:brows]
    big_b[wrows:, :] = raw_b[:brows]


def _tvd_mid_kernel(p1, p2, o_ref, *, passes: int, final: bool):
    """L2: block strides over a 2-window halo of the (wb, rstripe, lane)
    view of the packed plane; packed disp bit h = original stride
    _TBLK << h."""
    p = jnp.concatenate([p1[:, :, :], p2[:, :, :]], axis=0)
    for h in range(passes):
        s = 1 << h
        dead = jnp.full((s,) + p.shape[1:], _DEAD, jnp.int32)
        sh = jnp.concatenate([p[s:], dead], axis=0)
        p = _packed_pass(p, sh, h)
    keep = p.shape[0] // 2
    if final:
        o_ref[:, :, :] = _tconc_finalize(p[:keep], None, "int16")
    else:
        o_ref[:, :, :] = p[:keep]


def _tvd_high_kernel(p_ref, o_ref, *, passes: int, lwb: int,
                     nsb_out: int):
    """L3: super-block strides on the packed plane; the whole (small)
    super-block axis sits in one VMEM stripe. Always final."""
    p = p_ref[:, :, :]
    for h in range(passes):
        s = 1 << h
        dead = jnp.full((s,) + p.shape[1:], _DEAD, jnp.int32)
        sh = jnp.concatenate([p[s:], dead], axis=0)
        p = _packed_pass(p, sh, lwb + h)
    o_ref[:, :, :] = _tconc_finalize(p[:nsb_out], None, "int16")


@functools.partial(jax.jit, static_argnums=(2, 3, 4, 5))
def concentrate_tiled_vd(values: jnp.ndarray, disp: jnp.ndarray,
                         n_out: int, sb: int, disp_bound: int,
                         interpret: bool = False):
    """Exact tiled concentration with explicit displacement plane.

    values/disp: (blocks, R*sb, lanes) tiled planes (row = slot*sb + s);
      int16 payload, int32 displacement (>= 0 valid, < 2**31).
    Returns (blocks, covered_rows, lanes) int16 — whole output blocks;
    callers untile then slice/pad columns to ``n_out``.
    """
    blocks, rows, lanes = values.shape
    r = rows // sb
    nbk = -(-r // _TBLK)
    brows = _TBLK * sb
    lb = _TBLK.bit_length() - 1
    if (disp_bound >> lb) >= (1 << 15):
        raise ValueError(
            f"vd displacement bound {disp_bound} over the packed L2 "
            f"field ({_TBLK} << 15)"
        )
    need_mid = disp_bound >= _TBLK and nbk > 1
    n_out_slots = min(n_out, nbk * _TBLK)
    nbk_out = -(-n_out_slots // _TBLK)

    # L1 — right-to-left multi-block halo-carry windows
    low_final = not need_mid
    nw = max(1, _TVD_NW)
    nwin1 = -(-nbk // nw)
    nbkp1 = nwin1 * nw
    wrows = nw * brows
    pad = ((0, 0), (0, nbkp1 * brows - rows), (0, 0))
    v = jnp.pad(values, pad)
    d = jnp.pad(disp, pad, constant_values=-1)
    nwout1 = -(-nbk_out // nw) if low_final else nwin1
    blk_in = pl.BlockSpec((None, wrows, lanes),
                          lambda b, j: (b, nwin1 - 1 - j, 0),
                          memory_space=pltpu.VMEM)
    blk_out = pl.BlockSpec(
        (None, wrows, lanes),
        lambda b, j: (b, jnp.minimum(nwin1 - 1 - j, nwout1 - 1), 0),
        memory_space=pltpu.VMEM,
    )
    odt = jnp.int16 if low_final else jnp.int32
    low = pl.pallas_call(
        functools.partial(_tvd_low_kernel, sb=sb, final=low_final, nw=nw),
        grid=(blocks, nwin1),
        in_specs=[blk_in, blk_in],
        out_specs=[blk_out],
        out_shape=[jax.ShapeDtypeStruct((blocks, nwout1 * wrows, lanes),
                                        odt)],
        scratch_shapes=[pltpu.VMEM((wrows + brows, lanes), jnp.int32),
                        pltpu.VMEM((wrows + brows, lanes), jnp.int32)],
        interpret=interpret,
        compiler_params=_VMEM_LIMIT,
    )(v, d)[0]
    if low_final:
        return low
    p = low

    # L2 — block-stride passes over 2-window halos of the packed plane.
    # Window/stripe sizing: pipelined window I/O (2 halo reads + 1 write
    # of one int32 plane, double-buffered ~ 24 B/slot) plus the
    # not-reused-across-unroll per-pass temporaries (~8 B/slot/pass).
    def _mid_passes(w: int) -> int:
        mp = 0
        while (_TBLK << mp) <= disp_bound and (1 << mp) < w:
            mp += 1
        return mp

    wb = _TVD_WB
    rstripe = 512
    while (rstripe * wb * lanes
           * (24 + 8 * max(_mid_passes(wb), 1))) > _TVD_BUDGET:
        if rstripe > 8:
            rstripe //= 2
        elif wb > 16:
            wb //= 2
        else:
            break
    nwin = -(-nbk // wb)
    need_high = disp_bound >= _TBLK * wb and nwin > 1
    nbkp = nwin * wb
    if nbkp * brows > p.shape[1]:
        p = jnp.pad(p, ((0, 0), (0, nbkp * brows - p.shape[1]), (0, 0)),
                    constant_values=_DEAD)
    elif nbkp * brows < p.shape[1]:
        p = p[:, : nbkp * brows]  # sliced rows are dead padding
    p4 = p.reshape(blocks, nbkp, brows, lanes)
    # one all-dead halo window on the right
    p4 = jnp.pad(p4, ((0, 0), (0, wb), (0, 0), (0, 0)),
                 constant_values=_DEAD)
    mid_passes = _mid_passes(wb)
    while brows % rstripe:
        rstripe //= 2
    mid_final = not need_high
    mid_nwin = (-(-nbk_out // wb)) if mid_final else nwin
    win = lambda off: pl.BlockSpec(  # noqa: E731
        (None, wb, rstripe, lanes),
        lambda b, w, t, o=off: (b, w + o, t, 0),
        memory_space=pltpu.VMEM,
    )
    win_out = pl.BlockSpec((None, wb, rstripe, lanes),
                           lambda b, w, t: (b, w, t, 0),
                           memory_space=pltpu.VMEM)
    mid = pl.pallas_call(
        functools.partial(_tvd_mid_kernel, passes=mid_passes,
                          final=mid_final),
        grid=(blocks, mid_nwin, brows // rstripe),
        in_specs=[win(0), win(1)],
        out_specs=[win_out],
        out_shape=[jax.ShapeDtypeStruct(
            (blocks, mid_nwin * wb, brows, lanes),
            jnp.int16 if mid_final else jnp.int32)],
        interpret=interpret,
        compiler_params=_VMEM_LIMIT,
    )(p4, p4)[0]
    if mid_final:
        return mid.reshape(blocks, mid_nwin * wb * brows, lanes)

    # L3 — super-block strides; whole (small) axis in one stripe
    nsb = nwin
    srows = wb * brows
    p5 = mid.reshape(blocks, nsb, srows, lanes)
    high_passes = 0
    base = _TBLK * wb
    while (base << high_passes) <= disp_bound and (1 << high_passes) < nsb:
        high_passes += 1
    # single int32 plane: ~12 B/slot pipelined I/O + ~6 B/slot per
    # unrolled pass
    rs2 = 512
    while rs2 > 8 and (rs2 * nsb * lanes
                       * (12 + 6 * max(high_passes, 1))) > _TVD_BUDGET:
        rs2 //= 2
    while srows % rs2:
        rs2 //= 2
    nsb_out = -(-nbk_out // wb)
    stripe = pl.BlockSpec((None, nsb, rs2, lanes),
                          lambda b, t: (b, 0, t, 0),
                          memory_space=pltpu.VMEM)
    stripe_out = pl.BlockSpec((None, nsb_out, rs2, lanes),
                              lambda b, t: (b, 0, t, 0),
                              memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_tvd_high_kernel, passes=high_passes,
                          lwb=wb.bit_length() - 1, nsb_out=nsb_out),
        grid=(blocks, srows // rs2),
        in_specs=[stripe],
        out_specs=stripe_out,
        out_shape=jax.ShapeDtypeStruct((blocks, nsb_out, srows, lanes),
                                       jnp.int16),
        interpret=interpret,
        compiler_params=_VMEM_LIMIT,
    )(p5)
    return out.reshape(blocks, nsb_out * srows, lanes)


_WBLK = 1 << 12  # wide-kernel column block. Trades expensive lane-axis
# rolls (the 2-block halo sweep runs log2(B) passes) against cheap
# sublane shifts (the stripe kernel runs the remaining log2(R/B) passes
# in VMEM); measured optimum on v5e across nEDM/NOPTREX-scale axes.
# VMEM: ~5 live (8, 2*B) i32 temporaries per halo pass.


def _wide_kernel(v1_ref, d1_ref, ov_ref, od_ref, scrv_ref, scrd_ref, *,
                 final: bool):
    """All butterfly passes with stride < _WBLK over a 2-block halo window.

    Processes window [i*B, (i+2)*B) and emits block i. After pass b an
    element of the output block can have originated at most ``sum(2^0..2^b)
    = 2^(b+1)-1 < B`` columns to the right, so the halo covers every
    low-stride pass; the window's right half degrades pass by pass and is
    discarded. The grid walks column blocks right-to-left with the raw
    block carried in VMEM scratch as the next step's halo (one HBM read
    per element). With ``final`` (single-block rows: every displacement
    < _WBLK) the surviving elements are selected in-kernel and ``od_ref``
    receives zeros.
    """
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        scrv_ref[:, :] = jnp.zeros_like(scrv_ref)
        scrd_ref[:, :] = jnp.full_like(scrd_ref, -1)

    w = 2 * _WBLK
    raw_v = v1_ref[:, :]
    raw_d = d1_ref[:, :]
    v = jnp.concatenate([raw_v, scrv_ref[:, :]], axis=1)
    d = jnp.concatenate([raw_d, scrd_ref[:, :]], axis=1)
    cols = jax.lax.broadcasted_iota(jnp.int32, v.shape, 1)
    for b in range(_WBLK.bit_length() - 1):
        s = 1 << b
        vs = pltpu.roll(v, w - s, axis=1)  # left-roll by s
        ds = jnp.where(cols < (w - s), pltpu.roll(d, w - s, axis=1), -1)
        move = (ds >= 0) & ((ds & s) != 0)
        stay = (d >= 0) & ((d & s) == 0)
        v = jnp.where(move, vs, v)
        d = jnp.where(move, ds - s, jnp.where(stay, d, -1))
    if final:
        ov_ref[:, :] = jnp.where(d == 0, v, 0)[:, :_WBLK]
        od_ref[:, :] = jnp.zeros_like(od_ref)
    else:
        ov_ref[:, :] = v[:, :_WBLK]
        od_ref[:, :] = d[:, :_WBLK]
    scrv_ref[:, :] = raw_v
    scrd_ref[:, :] = raw_d


def _w16_pass(p, sh, disp_bit: int):
    """One sign-biased packed-plane pass routing on displacement bit
    ``disp_bit`` (plane bit 16 + disp_bit).

    The plane stores ``(disp << 16 | halfword) ^ 0x8000_0000`` as int32,
    so signed ``maximum`` realizes unsigned packed order (Mosaic has no
    unsigned max) and dead = INT32_MIN — the biased image of
    disp == 0, val == 0 — which always stays and loses every max. Bits 16..30
    test unchanged under the bias; the disp-bit-15 pass (plane bit 31)
    tests inverted. Clearing a set bit needs no borrow, so the move
    update is a XOR.
    """
    bit = 16 + disp_bit
    if bit == 31:
        smask = _DEAD  # int32 with only bit 31 set
        stay = jnp.where((p & smask) != 0, p, _DEAD)
        move = jnp.where((sh & smask) == 0, sh ^ smask, _DEAD)
    else:
        smask = jnp.int32(1 << bit)
        stay = jnp.where((p & smask) == 0, p, _DEAD)
        move = jnp.where((sh & smask) != 0, sh ^ smask, _DEAD)
    return jnp.maximum(stay, move)


def _w16_home(p):
    """Select arrived elements: original disp field == 0 <=> biased
    bits 16..30 clear and bit 31 set."""
    return jnp.where((p & jnp.int32(-65536)) == _DEAD, p & 0xFFFF, 0)


def _wide16_low_kernel(p1_ref, op_ref, scr_ref, *, final: bool):
    """Low-stride passes on one sign-biased packed plane (2-block halo).

    Halves both HBM traffic and per-pass ops vs the two-plane
    :func:`_wide_kernel`; requires payloads <= 16 bits and displacements
    <= 2**16 - 1 (see :func:`_w16_pass` for the bias scheme). The grid
    walks column blocks right-to-left, carrying each step's raw block in
    VMEM scratch as the next step's halo — one HBM read per element.
    """
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        scr_ref[:, :] = jnp.full_like(scr_ref, _DEAD)

    w = 2 * _WBLK
    raw = p1_ref[:, :]
    p = jnp.concatenate([raw, scr_ref[:, :]], axis=1)
    cols = jax.lax.broadcasted_iota(jnp.int32, p.shape, 1)
    for b in range(_WBLK.bit_length() - 1):
        s = 1 << b
        sh = pltpu.roll(p, w - s, axis=1)  # left-roll by s
        sh = jnp.where(cols < (w - s), sh, _DEAD)
        p = _w16_pass(p, sh, b)
    if final:
        p = _w16_home(p)
    op_ref[:, :] = p[:, :_WBLK]
    scr_ref[:, :] = raw


def _wide16_high_kernel(p_ref, op_ref, *, passes: int):
    """Block-stride passes + final select on a packed-plane stripe."""
    p = p_ref[:, :, :]
    for h in range(passes):
        s = 1 << h
        pad = jnp.full((p.shape[0], s, p.shape[2]), _DEAD, jnp.int32)
        sh = jnp.concatenate([p[:, s:, :], pad], axis=1)
        p = _w16_pass(p, sh, (_WBLK.bit_length() - 1) + h)
    op_ref[:, :, :] = _w16_home(p)


@functools.partial(jax.jit, static_argnums=(2, 3, 4))
def _concentrate_wide16(values: jnp.ndarray, disp: jnp.ndarray, n_out: int,
                        disp_bound: int, interpret: bool = False):
    """Single-plane wide concentration (payload <= 16 bits, disp < 2**16).

    Covers the mid-wide regime between the packed kernel (R < 2**15) and
    the two-plane :func:`_concentrate_wide` — e.g. decode staging of
    escape-heavy or low-M streams, whose slot axes outgrow 2**15 while
    their displacement bound (W-1)*(j_max-1) still fits 16 bits.
    """
    rows, r = values.shape
    d = disp.astype(jnp.int32)
    val = values.astype(jnp.int32) & 0xFFFF
    p = jnp.where(d >= 0, ((d << 16) | val) ^ _DEAD, _DEAD)
    out = concentrate_wide16_plane(p, n_out, disp_bound, interpret)
    if values.dtype == jnp.int16:
        return ((out << 16) >> 16).astype(jnp.int16)
    return out.astype(values.dtype)


@functools.partial(jax.jit, static_argnums=(1, 2, 3))
def concentrate_wide16_plane(p: jnp.ndarray, n_out: int, disp_bound: int,
                             interpret: bool = False):
    """:func:`_concentrate_wide16` on a PRE-BUILT sign-biased plane
    ``((disp << 16) | halfword) ^ 2**31`` (dead = INT32_MIN). Callers
    whose displacement math is elementwise build the plane in one fused
    XLA pass instead of materializing separate value/disp arrays (the
    split-decode merge's displacements, for instance, are a per-sub-block
    constant). Returns (rows, n_out) int32 halfwords (caller casts)."""
    rows, r = p.shape
    nb = -(-r // _WBLK)
    rowp = -(-rows // 8) * 8
    p = jnp.pad(p, ((0, rowp - rows), (0, nb * _WBLK - r)),
                constant_values=_DEAD)
    # block-stride passes needed: elements move at most disp_bound slots
    passes = 0
    while (1 << passes) < nb and (_WBLK << passes) <= disp_bound:
        passes += 1
    bs = 8
    op = pl.pallas_call(
        functools.partial(_wide16_low_kernel, final=passes == 0),
        interpret=interpret,
        compiler_params=_VMEM_LIMIT,
        grid=(rowp // bs, nb),
        in_specs=[
            pl.BlockSpec((bs, _WBLK), lambda i, j: (i, nb - 1 - j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bs, _WBLK), lambda i, j: (i, nb - 1 - j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rowp, nb * _WBLK), jnp.int32),
        scratch_shapes=[pltpu.VMEM((bs, _WBLK), jnp.int32)],
    )(p)
    if passes:
        bc = 2048
        while bc > 128 and nb * bc > (1 << 16):
            bc //= 2
        op = pl.pallas_call(
            functools.partial(_wide16_high_kernel, passes=passes),
            interpret=interpret,
            compiler_params=_VMEM_LIMIT,
            grid=(rowp // bs, _WBLK // bc),
            in_specs=[
                pl.BlockSpec((bs, nb, bc), lambda i, j: (i, 0, j),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((bs, nb, bc), lambda i, j: (i, 0, j),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((rowp, nb, _WBLK), jnp.int32),
        )(op.reshape(rowp, nb, _WBLK)).reshape(rowp, nb * _WBLK)
    if op.shape[1] < n_out:
        op = jnp.pad(op, ((0, 0), (0, n_out - op.shape[1])))
    return op[:rows, :n_out].astype(jnp.int32)


def _high_kernel(v_ref, d_ref, ov_ref, *, nb: int):
    """Block-stride butterfly passes on a (bs, nb, Bc) column stripe.

    After the low-pass sweep every remaining displacement is a multiple
    of _WBLK, so elements only move between slots {i * _WBLK + o} with a
    fixed column offset o — i.e. along axis 1 of the (rows, nb, _WBLK)
    view, which this kernel walks entirely in VMEM (the XLA alternative
    materializes 4 HBM round-trips per pass). Emits the final payload
    plane with dead slots zeroed; the displacement plane dies here.
    """
    v = v_ref[:, :, :]
    d = d_ref[:, :, :]
    h = 0
    while (1 << h) < nb:
        s = 1 << h
        sb = s * _WBLK
        pad_v = jnp.zeros((v.shape[0], s, v.shape[2]), jnp.int32)
        pad_d = jnp.full((d.shape[0], s, d.shape[2]), -1, jnp.int32)
        vs = jnp.concatenate([v[:, s:, :], pad_v], axis=1)
        ds = jnp.concatenate([d[:, s:, :], pad_d], axis=1)
        move = (ds >= 0) & ((ds & sb) != 0)
        stay = (d >= 0) & ((d & sb) == 0)
        v = jnp.where(move, vs, v)
        d = jnp.where(move, ds - sb, jnp.where(stay, d, -1))
        h += 1
    ov_ref[:, :, :] = jnp.where(d == 0, v, 0)


@functools.partial(jax.jit, static_argnums=(2, 3))
def _concentrate_wide(values: jnp.ndarray, disp: jnp.ndarray, n_out: int,
                      interpret: bool = False):
    """Concentration for slot axes too wide for the packed planes.

    Keeps (payload, displacement) as two explicit int32 planes, so any
    displacement < 2**31 routes and 32-bit payloads need no half-word
    split. Low-stride passes (< _WBLK) all run inside one VMEM kernel
    sweep; afterwards every remaining displacement is a multiple of
    _WBLK, so elements move between blocks at a fixed column offset and
    the ~log2(R/_WBLK) high-stride passes run as cheap XLA selects on a
    (rows, n_blocks, _WBLK) view.
    """
    rows, r = values.shape
    v = values.astype(jnp.int32)
    d = disp.astype(jnp.int32)
    nb = -(-r // _WBLK)
    rowp = -(-rows // 8) * 8
    v = jnp.pad(v, ((0, rowp - rows), (0, nb * _WBLK - r)))
    d = jnp.pad(d, ((0, rowp - rows), (0, nb * _WBLK - r)),
                constant_values=-1)
    kern = functools.partial(_wide_kernel, final=nb == 1)
    bs = 8
    rtl = pl.BlockSpec((bs, _WBLK), lambda i, j: (i, nb - 1 - j),
                       memory_space=pltpu.VMEM)
    ov, od = pl.pallas_call(
        kern,
        interpret=interpret,
        compiler_params=_VMEM_LIMIT,
        grid=(rowp // bs, nb),
        in_specs=[rtl, rtl],
        out_specs=[rtl, rtl],
        out_shape=[
            jax.ShapeDtypeStruct((rowp, nb * _WBLK), jnp.int32),
        ] * 2,
        scratch_shapes=[pltpu.VMEM((bs, _WBLK), jnp.int32)] * 2,
    )(v, d)
    if nb > 1:
        # column-offset stripe (bs, nb, bc): ~6 live i32 temporaries per
        # pass must fit VMEM, so the stripe narrows as nb grows
        bc = 2048
        while bc > 128 and nb * bc > (1 << 15):
            bc //= 2
        v3 = ov.reshape(rowp, nb, _WBLK)
        d3 = od.reshape(rowp, nb, _WBLK)
        ov = pl.pallas_call(
            functools.partial(_high_kernel, nb=nb),
            interpret=interpret,
            compiler_params=_VMEM_LIMIT,
            grid=(rowp // bs, _WBLK // bc),
            in_specs=[
                pl.BlockSpec((bs, nb, bc), lambda i, j: (i, 0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bs, nb, bc), lambda i, j: (i, 0, j),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((bs, nb, bc), lambda i, j: (i, 0, j),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((rowp, nb, _WBLK), jnp.int32),
        )(v3, d3).reshape(rowp, nb * _WBLK)
    if ov.shape[1] < n_out:
        ov = jnp.pad(ov, ((0, 0), (0, n_out - ov.shape[1])))
    out = ov[:rows, :n_out]
    if values.dtype == jnp.int16:
        return ((out << 16) >> 16).astype(jnp.int16)
    return out.astype(values.dtype)


@functools.partial(jax.jit, static_argnums=(2, 3, 4))
def concentrate_pallas(values: jnp.ndarray, disp: jnp.ndarray, n_out: int,
                       disp_bound: int | None = None,
                       interpret: bool = False):
    """Drop-in TPU replacement for :func:`.concentrate.concentrate`.

    values: (rows, R) payload (any integer dtype; 16-bit payloads route as
      one packed plane, 32-bit as two half-word planes sharing routing).
    disp: (rows, R) displacement ``slot - destination`` (>= 0 valid,
      monotone, conflict-free), negative for dead slots.
    n_out: static output width.
    disp_bound: optional static upper bound on every displacement; lets
      wide 16-bit-payload cases route through the single-plane kernel.
    """
    r = values.shape[1]
    if r >= (1 << 15):
        # displacements no longer fit the packed 15-bit field and a full
        # row outgrows VMEM; route long slot axes (nEDM/NOPTREX-scale
        # segments) through the blocked wide kernels instead
        if (disp_bound is not None and disp_bound < (1 << 16)
                and values.dtype.itemsize <= 2):
            return _concentrate_wide16(values, disp, n_out, disp_bound,
                                       interpret)
        return _concentrate_wide(values, disp, n_out, interpret)
    d = disp.astype(jnp.int32)
    base = jnp.where(d < 0, _DEAD, d << 16)
    if values.dtype.itemsize <= 2:
        p = base | jnp.where(d < 0, 0, values.astype(jnp.int32) & 0xFFFF)
        (out,) = _run((p,), n_out, interpret)
        if values.dtype == jnp.int16:
            return ((out << 16) >> 16).astype(jnp.int16)
        return out.astype(values.dtype)
    v = values.astype(jnp.int32)
    hi = base | jnp.where(d < 0, 0, (v >> 16) & 0xFFFF)
    lo = (v & 0xFFFF).astype(jnp.int16)  # follower: payload only
    out_hi, out_lo = _run((hi, lo), n_out, interpret)
    return ((out_hi << 16) | (out_lo.astype(jnp.int32) & 0xFFFF)).astype(
        values.dtype
    )
