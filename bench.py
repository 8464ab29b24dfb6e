"""Benchmark: Delta-Rice encode+decode throughput per chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "GB/s", "vs_baseline": N}

Baseline: the reference C filter's best published single-CPU numbers
(Threadripper 5955WX, 32 threads, Nab dataset: write 2.387 GB/s, read
1.782 GB/s — docs/Performance.md:24-25). We report the harmonic mean of
encode and decode device throughput on Nab-shaped data (int16 waveforms,
sigma~10 Gaussian deltas, M=8, L=7000) vs the harmonic mean of the
reference pair (2.041 GB/s).

Timing methodology: this environment reaches the TPU through a relay whose
host<->device synchronization costs ~30 ms flat, and ``block_until_ready``
does not always actually synchronize. Each measurement therefore times N
queued dispatches bracketed by one forced scalar readback, subtracts the
independently measured sync-only cost, and divides by N.
"""

from __future__ import annotations

import json
import time

import numpy as np

import jax
import jax.numpy as jnp

from deltarice_tpu.codec import (
    _decode_device,
    _rate_hint,
    _redecode_bad_rows,
    _reencode_bad_rows,
    _service_hint,
    _words_hint,
    encode_segments,
)
from deltarice_tpu.config import RiceConfig

BASELINE_GBPS = 2.0 / (1.0 / 2.387 + 1.0 / 1.782)  # harmonic mean ref w/r


def _sync(x) -> float:
    return float(jnp.sum(x[0] if isinstance(x, (tuple, list)) else x)[()])


def _sync_cost(iters: int = 10) -> float:
    tiny = jnp.ones((8, 128), jnp.int32)
    f = jax.jit(lambda a: jnp.sum(a))
    float(f(tiny)[()])
    t0 = time.perf_counter()
    for _ in range(iters):
        float(f(tiny)[()])
    return (time.perf_counter() - t0) / iters


def _timeit(fn, *args, iters: int = 60, sync_cost: float = 0.0,
            reps: int = 3):
    """Time ``iters`` queued dispatches, growing ``iters`` until device
    work dominates the relay's ~30-40 ms sync cost, then repeat the
    measurement ``reps`` times and keep the best: the relay's
    submission/queue behavior swings single measurements up to ~2x with
    its load (identical code measured 8.9-37 GB/s across one day), and
    the best of a few back-to-back windows is the stable estimator of
    the device's actual throughput."""
    _sync(fn(*args))  # warmup/compile
    while True:
        t0 = time.perf_counter()
        out = None
        for _ in range(iters):
            # keep ONE output live: dropping the previous reference lets
            # completed dispatches free their buffers, so in-flight HBM
            # stays bounded by queue depth, not by iters
            out = fn(*args)
        _sync(out)
        dt = time.perf_counter() - t0
        del out
        if dt - sync_cost > max(4 * sync_cost, 0.15) or iters >= 2048:
            break
        iters *= 4
    best = dt
    for _ in range(max(reps - 1, 0)):
        t0 = time.perf_counter()
        out = None
        for _ in range(iters):
            out = fn(*args)
        _sync(out)
        best = min(best, time.perf_counter() - t0)
        del out
    return max(best - sync_cost, 1e-9) / iters


def _require_device(timeout_s: float = 240.0):
    """Fail fast (clear message, rc 1) if device init hangs.

    The dev relay's device grant can wedge server-side; jax.devices()
    then blocks forever, which would silently eat the whole benchmark
    window. Probing in a subprocess keeps this process clean."""
    import subprocess
    import sys

    try:
        subprocess.run(
            [sys.executable, "-c",
             "import jax; jax.devices()"],
            timeout=timeout_s, check=True, capture_output=True,
        )
    except (subprocess.TimeoutExpired, subprocess.CalledProcessError):
        sys.stderr.write(
            "bench.py: device backend unreachable (relay/device init did "
            f"not answer within {timeout_s:.0f}s) — no measurement taken\n"
        )
        raise SystemExit(1)


def main():
    import sys

    _require_device()
    if "--file" in sys.argv:
        # end-to-end HDF5 file<->RAM mode (reference headline metric):
        # ours-native vs reference-C through the identical h5py pipeline,
        # plus the TPU direct-chunk path. See tools/bench_file.py.
        sys.path.insert(0, "tools")
        import bench_file

        mb = 64.0
        if "--mb" in sys.argv:
            mb = float(sys.argv[sys.argv.index("--mb") + 1])
        geom = "all"  # all three published geometries (Nab/nEDM/NOPTREX)
        if "--geom" in sys.argv:
            geom = sys.argv[sys.argv.index("--geom") + 1]
        print(json.dumps(bench_file.run(mb=mb, geom=geom)))
        return

    nseg, length = 2048, 7000  # ~29 MB of int16 per batch: large enough
    # that per-dispatch submission cost through the dev relay (which
    # varies ~0.3-0.8 ms by the hour) stays well under the device time
    cfg = RiceConfig(8, length)
    rng = np.random.default_rng(0)
    x = np.cumsum(
        np.round(rng.normal(0, 10, (nseg, length))), axis=-1
    ).astype(np.int16)
    nbytes = x.nbytes

    sync_cost = _sync_cost()

    xd = jnp.asarray(x)
    nvalid = jnp.full((nseg,), length, dtype=jnp.int32)
    max_words = cfg.max_words(length)

    # encode exactly as the production writer does: emission rate and
    # placement-width cap from a host-side subsample (rate 2 on dense
    # data = one staging slot per sample pair; the cap shrinks the
    # placement concentration's static output to ~the data's compressed
    # size instead of the 25-bit worst case), overflow flags fetched
    # once per batch — compress_batch's dispatch/collect split — with
    # flagged/over-cap segments re-encoded exactly in the checked pass
    rate = _rate_hint(x, cfg)
    cap = _words_hint(x, cfg, length)
    bad = None
    if rate > 1:
        from deltarice_tpu.ops.pack_pallas import pack_encode_pallas_bits

        enc = lambda a, b: pack_encode_pallas_bits(
            a, b, cfg.k, cap, True, None, rate
        )[:2]
        t_enc = _timeit(enc, xd, nvalid, sync_cost=sync_cost)
        words, nwords, _nb, bad = pack_encode_pallas_bits(
            xd, nvalid, cfg.k, cap, True, None, rate
        )
    else:
        enc = lambda a, b: encode_segments(a, b, cfg, cap, "auto")
        t_enc = _timeit(enc, xd, nvalid, sync_cost=sync_cost)
        words, nwords = enc(xd, nvalid)
    jax.block_until_ready((words, nwords))
    nw = np.asarray(nwords)
    over = nw > cap
    if bad is not None:
        over = over | np.asarray(bad)
    wn = np.asarray(words[:, : min(int(nw.max()) + 1, cap)])
    if int(nw.max()) + 1 > cap:
        wn = np.pad(wn, ((0, 0), (0, int(nw.max()) + 1 - cap)))
    if over.any():
        wn = _reencode_bad_rows(wn, x, np.asarray(nvalid), over, cfg,
                                max_words)

    # decode exactly as the production reader does: tighter padded width,
    # service rate sized from the per-segment header stats (the real read
    # paths always have counts from the header walk), lag flags fetched
    # once per batch — decompress_batch's async dispatch/collect split —
    # and flagged segments re-decoded exactly in the checked pass below
    w = int(nw.max()) + 1
    w = -(-w // 256) * 256
    words_in = jnp.asarray(
        np.pad(wn, ((0, 0), (0, max(0, w - wn.shape[1]))))[:, :w]
    )
    counts = np.asarray(nwords)
    j_eff = _service_hint(counts, np.asarray(nvalid), cfg.k)
    dec = lambda a: _decode_device(a, length, cfg, j_eff)[0]
    t_dec = _timeit(dec, words_in, sync_cost=sync_cost)
    out_d, bad = _decode_device(words_in, length, cfg, j_eff)
    out = _redecode_bad_rows(np.asarray(out_d), bad, np.asarray(words_in),
                             length, cfg)
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
                    "sync_cost_ms": round(sync_cost * 1e3, 2),
                    "batch": [nseg, length],
                },
            }
        )
    )


if __name__ == "__main__":
    main()
