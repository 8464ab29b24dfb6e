"""Per-stage timing of the encode/decode pipelines (relay-corrected).

Times each jitted sub-program of the Nab-shaped bench config separately so
optimization targets the real bottleneck. Method per docs/Performance.md:
queue N dispatches, force one scalar readback, subtract sync cost.
"""

from __future__ import annotations

import time

import numpy as np

import jax
import jax.numpy as jnp

from deltarice_tpu.codec import decode_segments, encode_segments
from deltarice_tpu.config import RiceConfig
from deltarice_tpu.ops.pack_pallas import _encode_kernel_program, _placement
from deltarice_tpu.ops.unpack_pallas import (
    _compaction,
    _kernel_program,
    _sublane_factor,
    _chunk_words,
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
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    dt = (time.perf_counter() - t0 - sc) / iters
    print(f"{label:34s} {dt*1e3:8.3f} ms")
    return out, dt


def main():
    nseg, length = 1024, 7000
    cfg = RiceConfig(8, length)
    rng = np.random.default_rng(0)
    x = np.cumsum(np.round(rng.normal(0, 10, (nseg, length))), axis=-1).astype(
        np.int16
    )
    sc = sync_cost()
    print(f"sync cost {sc*1e3:.2f} ms; batch {nseg}x{length} "
          f"({x.nbytes/1e6:.1f} MB)")

    xd = jnp.asarray(x)
    nvalid = jnp.full((nseg,), length, dtype=jnp.int32)
    max_words = cfg.max_words(length)

    # --- encode total + stages
    _, t_enc = timeit(
        "encode total", lambda: encode_segments(xd, nvalid, cfg, max_words,
                                                 "pallas"), sc=sc
    )
    kp = jax.jit(lambda a, b: _encode_kernel_program(a, b, cfg.k, True))
    (wst, kst, fw, fk, nw), t_ek = timeit(
        "  encode kernel prog (w/ transp)", kp, xd, nvalid, sc=sc
    )
    _, t_pl = timeit(
        "  placement (concentrate)",
        jax.jit(lambda a, b, c, d: _placement(a, b, c, d, max_words)),
        wst, kst, fw, fk, sc=sc,
    )

    # --- decode total + stages
    words, nwords = encode_segments(xd, nvalid, cfg, max_words, "pallas")
    w = int(np.asarray(nwords).max()) + 1
    w = -(-w // 256) * 256
    wd = jnp.asarray(np.asarray(words)[:, :w])
    _, t_dec = timeit(
        "decode total", lambda: decode_segments(wd, length, cfg, "pallas"),
        sc=sc,
    )
    sb = _sublane_factor(nseg)
    wc = _chunk_words(cfg.k, sb)
    jmax = codewords_per_word(cfg.k)
    dk = jax.jit(lambda a: _kernel_program(a, cfg.k, True, sb, wc))
    (stage, ntab), t_dk = timeit(
        "  decode kernel prog (w/ transp)", dk, wd, sc=sc
    )
    _, t_dc = timeit(
        "  compaction (concentrate)",
        jax.jit(lambda a, b: _compaction(a, b, length, wc, jmax)),
        stage, ntab, sc=sc,
    )
    print(f"decode stage width R = {stage.shape[1]} (words in {w})")

    # --- isolated transposes at the real sizes
    big16 = jnp.asarray(
        np.zeros((stage.shape[1], 1024), np.int16)
    )
    _, _ = timeit("  transpose2d i16 (R,1024)", transpose2d, big16, sc=sc)
    big32 = jnp.asarray(np.zeros((8192, 1024), np.int32))
    _, _ = timeit("  transpose2d i32 (8192,1024)", transpose2d, big32, sc=sc)

    print(f"\nencode: kernel+transp {t_ek*1e3:.3f} + placement "
          f"{t_pl*1e3:.3f} vs total {t_enc*1e3:.3f}")
    print(f"decode: kernel+transp {t_dk*1e3:.3f} + compaction "
          f"{t_dc*1e3:.3f} vs total {t_dec*1e3:.3f}")


if __name__ == "__main__":
    main()
