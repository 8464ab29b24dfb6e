"""Benchmark: Delta-Rice encode+decode throughput per chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "GB/s", "vs_baseline": N}

Baseline: the reference C filter's best published single-CPU numbers
(Threadripper 5955WX, 32 threads, Nab dataset: write 2.387 GB/s, read
1.782 GB/s — docs/Performance.md:24-25). We report the harmonic mean of
encode and decode device throughput on Nab-shaped data (int16 waveforms,
sigma~10 Gaussian deltas, M=8, L=7000) and compare against the harmonic
mean of the reference pair (2.041 GB/s).
"""

from __future__ import annotations

import json
import time

import numpy as np

import jax
import jax.numpy as jnp

from deltarice_tpu.codec import decode_segments, encode_segments
from deltarice_tpu.config import RiceConfig

BASELINE_GBPS = 2.0 / (1.0 / 2.387 + 1.0 / 1.782)  # harmonic mean ref w/r


def _timeit(fn, *args, warmup=2, iters=10):
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    cfg = RiceConfig(8, 7000)
    nseg, length = 512, 7000  # ~7.2 MB of int16 per batch
    rng = np.random.default_rng(0)
    x = np.cumsum(
        np.round(rng.normal(0, 10, (nseg, length))), axis=-1
    ).astype(np.int16)
    nbytes = x.nbytes

    xd = jnp.asarray(x)
    nvalid = jnp.full((nseg,), length, dtype=jnp.int32)
    max_words = cfg.max_words(length)

    enc = lambda a, b: encode_segments(a, b, cfg, max_words, "segsum")
    t_enc = _timeit(enc, xd, nvalid)
    words, nwords = jax.block_until_ready(enc(xd, nvalid))

    # decode from a tighter padded width (what the real reader builds)
    w = int(np.asarray(nwords).max()) + 1
    w = -(-w // 256) * 256
    words_in = jnp.asarray(np.asarray(words)[:, :w])
    dec = lambda a: decode_segments(a, length, cfg)
    t_dec = _timeit(dec, words_in)
    out = np.asarray(jax.block_until_ready(dec(words_in)))
    assert np.array_equal(out, x), "round-trip failed in bench"

    enc_gbps = nbytes / t_enc / 1e9
    dec_gbps = nbytes / t_dec / 1e9
    hmean = 2.0 / (1.0 / enc_gbps + 1.0 / dec_gbps)
    print(
        json.dumps(
            {
                "metric": "int16 delta-rice encode+decode harmonic-mean throughput per chip",
                "value": round(hmean, 3),
                "unit": "GB/s",
                "vs_baseline": round(hmean / BASELINE_GBPS, 3),
                "detail": {
                    "encode_GBps": round(enc_gbps, 3),
                    "decode_GBps": round(dec_gbps, 3),
                    "platform": jax.devices()[0].platform,
                    "baseline_GBps": round(BASELINE_GBPS, 3),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
