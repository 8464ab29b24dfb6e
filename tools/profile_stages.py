"""Per-stage timing of the encode/decode pipelines (relay-corrected).

Times each jitted sub-program of the codec separately so optimization
targets the real bottleneck. Method per docs/Performance.md: queue N
dispatches, force one scalar readback, subtract sync cost.

Usage: python tools/profile_stages.py [nseg length M]
(defaults: the Nab bench config 1024 7000 8; try 1024 81920 16 for the
nEDM-shaped wide-concentration path)
"""

from __future__ import annotations

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from deltarice_tpu.codec import encode_segments
from deltarice_tpu.config import RiceConfig
from deltarice_tpu.ops.pack_pallas import (
    _encode_kernel_program,
    _is_packed,
    _placement,
)
from deltarice_tpu.ops.unpack_pallas import (
    _chunk_words,
    _compaction,
    _kernel_program,
    _sublane_factor,
    codewords_per_word,
)
from deltarice_tpu.ops.transpose_pallas import transpose2d


def _sync(x):
    leaves = jax.tree_util.tree_leaves(x)
    return float(jnp.sum(leaves[0].ravel()[0])[()])


def sync_cost(iters: int = 10) -> float:
    tiny = jnp.ones((8, 128), jnp.int32)
    f = jax.jit(lambda a: jnp.sum(a))
    _sync(f(tiny))
    t0 = time.perf_counter()
    for _ in range(iters):
        _sync(f(tiny))
    return (time.perf_counter() - t0) / iters


def timeit(label, fn, *args, iters=30, sc=0.0):
    out = fn(*args)
    _sync(out)
    while True:
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        _sync(out)
        el = time.perf_counter() - t0
        if el - sc > max(4 * sc, 0.15) or iters >= 4096:
            break
        iters *= 4
    dt = max(el - sc, 1e-9) / iters
    print(f"{label:34s} {dt*1e3:8.3f} ms  (x{iters})")
    return out, dt


def main():
    nseg, length, m = 1024, 7000, 8
    if len(sys.argv) == 4:
        nseg, length, m = map(int, sys.argv[1:])
    cfg = RiceConfig(m, length)
    rng = np.random.default_rng(0)
    x = np.cumsum(np.round(rng.normal(0, 10, (nseg, length))), axis=-1).astype(
        np.int16
    )
    sc = sync_cost()
    print(f"sync cost {sc*1e3:.2f} ms; batch {nseg}x{length} M={m} "
          f"({x.nbytes/1e6:.1f} MB); encode packed planes: "
          f"{_is_packed(length)}")

    xd = jnp.asarray(x)
    nvalid = jnp.full((nseg,), length, dtype=jnp.int32)
    max_words = cfg.max_words(length)

    # --- encode total + stages
    _, t_enc = timeit(
        "encode total", lambda: encode_segments(xd, nvalid, cfg, max_words,
                                                "pallas"), sc=sc
    )
    from deltarice_tpu.ops.pack_pallas import _SB, _TILED_FORCE
    from deltarice_tpu.ops.concentrate_pallas import concentrate_tiled
    from deltarice_tpu.ops.unpack_pallas import untile_rows

    if _is_packed(length) and _TILED_FORCE:
        (wst, kst, nw, _nb), t_ek = timeit(
            "  encode kernel prog (tiled)",
            lambda: _encode_kernel_program(xd, nvalid, cfg.k, True,
                                           tiled=True), sc=sc
        )
        lp = wst.shape[1] // _SB
        n_out = min(max_words, lp)
        bound = min(lp - 1, (1 << 15) - 1)
        out_t, t_pl = timeit(
            "  placement (tiled concentrate)",
            lambda: concentrate_tiled((wst, kst), n_out, _SB, bound,
                                      "u32"), sc=sc,
        )
        _, t_un = timeit(
            "  words untile",
            lambda: untile_rows(out_t, nseg, _SB), sc=sc,
        )
        t_pl += t_un
    else:
        (wst, kst, nw, _nb), t_ek = timeit(
            "  encode kernel prog (w/ transp)",
            lambda: _encode_kernel_program(xd, nvalid, cfg.k, True), sc=sc
        )
        _, t_pl = timeit(
            "  placement (concentrate)",
            lambda: _placement(wst, kst, max_words, _is_packed(length)),
            sc=sc,
        )

    # --- decode total + stages (from a realistically-sized word axis)
    words, nwords = encode_segments(xd, nvalid, cfg, max_words, "pallas")
    w = int(np.asarray(nwords).max()) + 1
    w = -(-w // 256) * 256
    wd = jnp.asarray(np.asarray(words)[:, :w])
    from deltarice_tpu.codec import _decode_device, _service_hint

    j_eff = _service_hint(np.asarray(nwords), np.asarray(nvalid), cfg.k)
    _, t_dec = timeit(
        "decode total",
        lambda: _decode_device(wd, length, cfg, j_eff)[0], sc=sc,
    )
    if j_eff is not None:
        print(f"  (service rate J={j_eff} vs bound)")
    sb = _sublane_factor(nseg)
    jmax = codewords_per_word(cfg.k)
    j = jmax if j_eff is None else max(2, j_eff)
    from deltarice_tpu.ops.unpack_pallas import (
        _LOOKBACK, _TILED as _TD, _TILED_FORCE as _TDF)
    from deltarice_tpu.ops.concentrate_pallas import (
        concentrate_packed, concentrate_tiled as _ct, concentrate_tiled_vd)

    wc = _chunk_words(j, sb)
    n_chunks = -(-w // wc)
    bound = (n_chunks * wc - 1) * (j - 1) + (
        0 if j_eff is None else _LOOKBACK)
    r_slots = n_chunks * wc * j
    tiled_ok = _TD and r_slots <= (1 << 17)
    packed_ok = bound < (1 << 15) and r_slots < (1 << 15) and not _TDF
    if packed_ok:
        print(f"decode path: packed lane-roll (slots {r_slots}, "
              f"words in {w}, J={j})")
        (plane, _ovf), t_dk = timeit(
            "  decode kernel prog (packed)",
            lambda: _kernel_program(wd, cfg.k, True, sb, wc, j, False,
                                    True, length), sc=sc,
        )
        _, t_dc = timeit(
            "  compaction (packed concentrate)",
            lambda: concentrate_packed((plane,), length, False), sc=sc,
        )
    elif tiled_ok and bound < (1 << 16):
        bias = bound >= (1 << 15)
        print(f"decode path: tiled {'bias' if bias else 'packed'} "
              f"(slots {r_slots}, words in {w}, J={j})")
        (plane, _ovf), t_dk = timeit(
            "  decode kernel prog (tiled)",
            lambda: _kernel_program(wd, cfg.k, True, sb, wc, j, False,
                                    True, length, True, bias), sc=sc,
        )
        out_t, t_dc = timeit(
            "  compaction (tiled concentrate)",
            lambda: _ct((plane,), length, sb, bound, "int16", False,
                        bias), sc=sc,
        )
        _, t_du = timeit(
            "  samples untile",
            lambda: untile_rows(out_t, nseg, sb), sc=sc,
        )
        t_dc += t_du
    elif _TD and r_slots <= (1 << 21):
        wc = _chunk_words(j, sb, heavy=True)
        n_chunks = -(-w // wc)
        bound = (n_chunks * wc - 1) * (j - 1) + (
            0 if j_eff is None else _LOOKBACK)
        print(f"decode path: tiled vd (slots {n_chunks * wc * j}, "
              f"words in {w}, J={j})")
        ((pv, pd), _ovf), t_dk = timeit(
            "  decode kernel prog (tiled vd)",
            lambda: _kernel_program(wd, cfg.k, True, sb, wc, j, False,
                                    True, length, True, False, True),
            sc=sc,
        )
        out_t, t_dc = timeit(
            "  compaction (tiled vd concentrate)",
            lambda: concentrate_tiled_vd(pv, pd, length, sb, bound),
            sc=sc,
        )
        _, t_du = timeit(
            "  samples untile",
            lambda: untile_rows(out_t, nseg, sb), sc=sc,
        )
        t_dc += t_du
    else:
        print(f"decode path: ntab + wide (slots {r_slots}, words in {w})")
        ((stage, ntab), _ovf), t_dk = timeit(
            "  decode kernel prog (w/ transp)",
            lambda: _kernel_program(wd, cfg.k, True, sb, wc, j, False,
                                    False, length),
            sc=sc,
        )
        _, t_dc = timeit(
            "  compaction (concentrate)",
            lambda: _compaction(stage, ntab, length, wc, j,
                                0 if j_eff is None else _LOOKBACK, True),
            sc=sc,
        )

    # --- isolated transposes at the real staging sizes
    big16 = jnp.asarray(np.zeros((8192, 1024), np.int16))
    _, _ = timeit("  transpose2d i16 (8192,1024)", transpose2d, big16, sc=sc)
    big32 = jnp.asarray(np.zeros((8192, 1024), np.int32))
    _, _ = timeit("  transpose2d i32 (8192,1024)", transpose2d, big32, sc=sc)

    nb = x.nbytes
    print(f"\nencode: kernel+transp {t_ek*1e3:.3f} + placement "
          f"{t_pl*1e3:.3f} vs total {t_enc*1e3:.3f} ms "
          f"({nb/t_enc/1e9:.1f} GB/s)")
    print(f"decode: kernel+transp {t_dk*1e3:.3f} + compaction "
          f"{t_dc*1e3:.3f} vs total {t_dec*1e3:.3f} ms "
          f"({nb/t_dec/1e9:.1f} GB/s)")


if __name__ == "__main__":
    main()
