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
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE = 128
_DEAD = -(1 << 31)  # int32 min
_VMEM_BUDGET = 12 << 20  # leave headroom under the ~16 MB/core VMEM


def _block_rows(rp: int, n_planes: int) -> int:
    """Rows per grid step: ~3 live (BS, rp) i32 arrays per plane must fit
    VMEM. Clamped to [8, 64] in sublane multiples."""
    bs = _VMEM_BUDGET // (rp * 4 * 3 * n_planes)
    return max(8, min(64, (bs // 8) * 8))


def _conc_kernel(*refs, rp: int, n_planes: int, passes: tuple[int, ...]):
    ins, outs = refs[:n_planes], refs[n_planes:]
    rows = ins[0].shape[0]
    cols = jax.lax.broadcasted_iota(jnp.int32, (rows, rp), 1)
    planes = [ref[:, :] for ref in ins]
    for b in passes:
        s = 1 << b
        smask = jnp.int32(s << 16)
        edge = cols < (rp - s)  # roll wraps cols >= rp-s; those die
        nxt = []
        for p in planes:
            # left-roll by s == circular roll by rp - s (pltpu.roll
            # requires a non-negative shift)
            sh = jnp.where(edge, pltpu.roll(p, rp - s, axis=1), _DEAD)
            stay = jnp.where((p & smask) == 0, p, _DEAD)
            move = jnp.where((sh & smask) != 0, sh - smask, _DEAD)
            nxt.append(jnp.maximum(stay, move))
        planes = nxt
    for ref, p in zip(outs, planes):
        keep = p[:, : ref.shape[1]]
        ref[:, :] = jnp.where(keep == _DEAD, 0, keep & 0xFFFF)


@functools.partial(jax.jit, static_argnums=(1,))
def _run(planes: tuple[jnp.ndarray, ...], n_out: int):
    rows, r = planes[0].shape
    rp = -(-r // _LANE) * _LANE
    n = len(planes)
    bs = _block_rows(rp, n)
    rowp = -(-rows // bs) * bs
    n_out_p = -(-n_out // _LANE) * _LANE
    padded = [
        jnp.pad(p, ((0, rowp - rows), (0, rp - r)), constant_values=_DEAD)
        for p in planes
    ]
    passes = tuple(b for b in range(max(1, (rp - 1).bit_length()))
                   if (1 << b) < rp)
    kern = functools.partial(
        _conc_kernel, rp=rp, n_planes=n, passes=passes
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
            jax.ShapeDtypeStruct((rowp, n_out_p), jnp.int32)
        ] * n,
    )(*padded)
    return [o[:rows, :n_out] for o in outs]


@functools.partial(jax.jit, static_argnums=(1, 2))
def concentrate_packed(planes, n_out: int, wide: bool):
    """Concentrate pre-packed ``disp << 16 | halfword`` planes.

    Producers that already know each element's displacement (the Mosaic
    codec kernels) emit planes in this layout directly, skipping the
    XLA packing pass below — XLA cannot fuse elementwise producers into
    a ``pallas_call``, so that pass costs a full HBM round trip of the
    staging arrays per plane. Dead slots must be ``INT32_MIN``.

    planes: tuple of (rows, R) int32 packed planes (1 for 16-bit
      payloads, 2 — high then low halfword — for 32-bit).
    wide: True to reassemble a uint32 payload from two planes.
    """
    outs = _run(tuple(planes), n_out)
    if wide:
        hi, lo = outs
        return ((hi << 16) | (lo & 0xFFFF)).astype(jnp.uint32)
    return outs[0]


@functools.partial(jax.jit, static_argnums=(2,))
def concentrate_pallas(values: jnp.ndarray, disp: jnp.ndarray, n_out: int):
    """Drop-in TPU replacement for :func:`.concentrate.concentrate`.

    values: (rows, R) payload (any integer dtype; 16-bit payloads route as
      one packed plane, 32-bit as two half-word planes sharing routing).
    disp: (rows, R) displacement ``slot - destination`` (>= 0 valid,
      monotone, conflict-free), negative for dead slots.
    n_out: static output width.
    """
    r = values.shape[1]
    if r >= (1 << 15):
        # displacements no longer fit the packed 15-bit field and a full
        # row outgrows VMEM; route very long slot axes (NOPTREX-scale
        # segments) through the XLA two-plane butterfly instead
        from .concentrate import concentrate

        return concentrate(values, disp, n_out)
    d = disp.astype(jnp.int32)
    base = jnp.where(d < 0, _DEAD, d << 16)
    if values.dtype.itemsize <= 2:
        p = base | jnp.where(d < 0, 0, values.astype(jnp.int32) & 0xFFFF)
        (out,) = _run((p,), n_out)
        if values.dtype == jnp.int16:
            return ((out << 16) >> 16).astype(jnp.int16)
        return out.astype(values.dtype)
    v = values.astype(jnp.int32)
    hi = base | jnp.where(d < 0, 0, (v >> 16) & 0xFFFF)
    lo = base | jnp.where(d < 0, 0, v & 0xFFFF)
    out_hi, out_lo = _run((hi, lo), n_out)
    return ((out_hi << 16) | (out_lo & 0xFFFF)).astype(values.dtype)
