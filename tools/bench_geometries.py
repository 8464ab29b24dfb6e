"""Device-codec benchmarks for every published geometry + stress regimes.

Covers the reference's three published datasets
(``/root/reference/docs/Performance.md``): Nab (1024x7000, M=8), nEDM@SNS
(32x81920, M=16), NOPTREX (32x500000, M=8) — plus the regimes the single
Nab bench can't see: an M sweep (BASELINE config 2) and escape-heavy
(incompressible) data. Relay-corrected timing per docs/Performance.md.

Usage: python tools/bench_geometries.py [--out GEOMETRY_BENCH.json]
       [--only nab,nedm,...]
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np

import jax
import jax.numpy as jnp

from deltarice_tpu.codec import (
    _decode_device,
    _rate_hint,
    _words_hint,
    _redecode_bad_rows,
    _reencode_bad_rows,
    _service_hint,
    _split_layout,
    _split_parts,
    encode_segments,
    encode_segments_bits,
)
from deltarice_tpu.config import RiceConfig


def _sync(x):
    leaves = jax.tree_util.tree_leaves(x)
    return float(jnp.sum(leaves[0].ravel()[0])[()])


def _sync_cost(iters: int = 10) -> float:
    tiny = jnp.ones((8, 128), jnp.int32)
    f = jax.jit(lambda a: jnp.sum(a))
    _sync(f(tiny))
    t0 = time.perf_counter()
    for _ in range(iters):
        _sync(f(tiny))
    return (time.perf_counter() - t0) / iters


def _timeit(fn, *args, iters: int, sync_cost: float) -> float:
    """Time ``iters`` queued dispatches, growing ``iters`` until the
    device work dominates the relay's ~30-40 ms sync cost (whose run-to-
    run variance would otherwise swamp fast configs)."""
    _sync(fn(*args))
    while True:
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        _sync(out)
        el = time.perf_counter() - t0
        if el - sync_cost > max(4 * sync_cost, 0.15) or iters >= 2048:
            return max(el - sync_cost, 1e-9) / iters
        iters *= 4


def bench_config(name: str, x: np.ndarray, cfg: RiceConfig, iters: int,
                 sync_cost: float) -> dict:
    nseg, length = x.shape
    parts = _split_parts(nseg, length, cfg)
    merge_ms = None
    if parts > 1:
        # long segments: the production path splits each waveform into
        # sub-blocks across lanes, then merges sub-streams ON DEVICE
        # (two concentrations); encode = device encode + device merge
        from deltarice_tpu.codec import _WORD_BUCKET, _merge_device

        xs, nv, p0, ls = _split_layout(x, np.full(nseg, length, np.int32),
                                       parts)
        xd, nvd, p0d = jnp.asarray(xs), jnp.asarray(nv), jnp.asarray(p0)
        mw = cfg.max_words(ls)
        rate = _rate_hint(x, cfg, ls)
        if rate > 1:
            from deltarice_tpu.codec import _reencode_bad_rows_device
            from deltarice_tpu.ops.pack_pallas import (
                pack_encode_pallas_bits)

            enc_d = lambda: pack_encode_pallas_bits(
                xd, nvd, cfg.k, mw, True, p0d, rate)[:3]
            t_enc = _timeit(enc_d, iters=iters, sync_cost=sync_cost)
            wsub, nwsub, nbits, bad = pack_encode_pallas_bits(
                xd, nvd, cfg.k, mw, True, p0d, rate)
            wsub = _reencode_bad_rows_device(wsub, xs, nv, bad, cfg, mw,
                                             p0)
        else:
            enc_d = lambda: encode_segments_bits(xd, nvd, cfg, mw,
                                                 "pallas", p0d)
            t_enc = _timeit(enc_d, iters=iters, sync_cost=sync_cost)
            wsub, nwsub, nbits = enc_d()
        nb2 = np.asarray(nbits).reshape(nseg, parts)
        total_bits = nb2.sum(axis=1)
        nwords = (total_bits + 31) >> 5
        out_w = -(-(int(nwords.max()) + 1) // _WORD_BUCKET) * _WORD_BUCKET
        w = -(-int((nb2.max() + 31) >> 5) // _WORD_BUCKET) * _WORD_BUCKET
        w3d = wsub[:, :w].reshape(nseg, parts, w)
        nbd = jnp.asarray(nb2)
        mrg = lambda: _merge_device(w3d, nbd, out_w)
        t_merge = _timeit(mrg, iters=iters, sync_cost=sync_cost)
        merge_ms = t_merge * 1e3
        t_enc = t_enc + t_merge
        words = mrg()
    else:
        xd = jnp.asarray(x)
        nvalid = jnp.full((nseg,), length, dtype=jnp.int32)
        max_words = cfg.max_words(length)
        rate = _rate_hint(x, cfg)
        cap = _words_hint(x, cfg, length)
        bad = None
        if rate > 1:  # production write path: reduced rate + flag fix
            from deltarice_tpu.ops.pack_pallas import (
                pack_encode_pallas_bits)

            enc = lambda: pack_encode_pallas_bits(
                xd, nvalid, cfg.k, cap, True, None, rate)[:2]
            t_enc = _timeit(enc, iters=iters, sync_cost=sync_cost)
            words, nwords, _nb, bad = pack_encode_pallas_bits(
                xd, nvalid, cfg.k, cap, True, None, rate)
        else:
            enc = lambda: encode_segments(xd, nvalid, cfg, cap,
                                          "pallas")
            t_enc = _timeit(enc, iters=iters, sync_cost=sync_cost)
            words, nwords = enc()
        # placement-cap overflow + reduced-rate flags: exact re-encode,
        # exactly as compress_batch_collect does
        nwn = np.asarray(nwords)
        over = nwn > cap
        if bad is not None:
            over = over | np.asarray(bad)
        if over.any():
            wn = np.asarray(words[:, : min(int(nwn.max()) + 1, cap)])
            if int(nwn.max()) + 1 > cap:
                wn = np.pad(wn, ((0, 0),
                                 (0, int(nwn.max()) + 1 - cap)))
            words = jnp.asarray(_reencode_bad_rows(
                wn, x, np.full(nseg, length, np.int32), over, cfg,
                max_words))
    nvalid = np.full((nseg,), length, dtype=np.int32)
    counts = np.asarray(nwords)
    w = int(counts.max()) + 1
    w = -(-w // 256) * 256
    wn = np.asarray(words[:, :w])
    if wn.shape[1] < w:  # merged output is exact-width; decode pads
        wn = np.pad(wn, ((0, 0), (0, w - wn.shape[1])))
    wd = jnp.asarray(wn)
    # size the decode service rate from the header stats exactly as the
    # production decompress paths do, so hostile regimes ride the
    # reduced-service kernel they would in real reads. Timing queues the
    # decode dispatches only — production (decompress_batch) fetches the
    # lag flags once per window, amortized like _timeit's single sync —
    # and the flagged-segment re-decode runs after, in the checked pass.
    j_eff = _service_hint(counts, nvalid, cfg.k)
    from deltarice_tpu.codec import (_decode_device_split,
                                     _split_decode_enabled)
    from deltarice_tpu.ops.split_decode import decode_split_parts

    sparts = 1
    if _split_decode_enabled():
        sparts = decode_split_parts(nseg, int(counts.max()), cfg.k, j_eff)
    if sparts > 1:
        # long segments: production reads decode as sparts speculative
        # sub-streams per segment (junction-checked; see split_decode)
        dec = lambda: _decode_device_split(wd, counts, length, cfg,
                                           sparts, nvalid)[0]
        t_dec = _timeit(dec, iters=iters, sync_cost=sync_cost)
        out_d, bad = _decode_device_split(wd, counts, length, cfg,
                                          sparts, nvalid)
    else:
        dec = lambda: _decode_device(wd, length, cfg, j_eff)[0]
        t_dec = _timeit(dec, iters=iters, sync_cost=sync_cost)
        out_d, bad = _decode_device(wd, length, cfg, j_eff)
    out = _redecode_bad_rows(np.asarray(out_d), bad, np.asarray(wd),
                             length, cfg)
    assert np.array_equal(out, x), f"{name}: round-trip failed"
    ratio = (
        4.0 * (1 + nseg + int(np.asarray(nwords).sum())) / x.nbytes
    )
    nb = x.nbytes
    row = {
        "config": name,
        "shape": [nseg, length],
        "m": cfg.m,
        "encode_GBps": round(nb / t_enc / 1e9, 3),
        "decode_GBps": round(nb / t_dec / 1e9, 3),
        "ratio": round(ratio, 3),
    }
    if parts > 1:
        row["split_parts"] = parts
        row["merge_ms"] = round(merge_ms, 2)
    if sparts > 1:
        row["decode_split_parts"] = sparts
        row["decode_flagged"] = int(np.asarray(bad).sum())
    elif j_eff is not None:
        row["decode_service_j"] = j_eff
    return row


def make_data(kind: str, shape, sigma: float, seed=0) -> np.ndarray:
    rng = np.random.default_rng(seed)
    if kind == "uniform":  # incompressible: every sample escapes
        return rng.integers(-32768, 32768, shape).astype(np.int16)
    return np.cumsum(
        np.round(rng.normal(0, sigma, shape)), axis=-1
    ).astype(np.int16)


CONFIGS = {
    # published geometries (docs/Performance.md:14,27,38); nEDM/NOPTREX
    # batch up to >=1024 segments so the kernels' lane grid stays full
    "nab": lambda: (make_data("walk", (1024, 7000), 10.0),
                    RiceConfig(8, 7000)),
    # sigma matches models/profiles.py's nEDM profile: at M=16 the
    # measured ratio lands ~0.316, just above the 5/16 = 0.3125 floor
    # every int16 input has at these cd_values (the published 27% is
    # unreachable; see profiles.py docstring). sigma=16 (round 1-4)
    # drifted to 0.383 and misstated the size story.
    "nedm": lambda: (make_data("walk", (1024, 81920), 4.0),
                     RiceConfig(16, 81920)),
    "noptrex": lambda: (make_data("walk", (256, 500000), 8.0),
                        RiceConfig(8, 500000)),
    # BASELINE config 2: M sweep on Nab-shaped data
    "nab_m2": lambda: (make_data("walk", (1024, 7000), 10.0),
                       RiceConfig(2, 7000)),
    "nab_m32": lambda: (make_data("walk", (1024, 7000), 10.0),
                        RiceConfig(32, 7000)),
    # escape-heavy worst case (reference test_worst_case analog, at scale)
    "escape_uniform": lambda: (make_data("uniform", (1024, 7000), 0.0),
                               RiceConfig(8, 7000)),
    # hostile batch with a dense minority: 1% compressible segments
    # must not forfeit the reduced service rate (quantile-sized J;
    # outliers lag-flag and re-decode exactly)
    "mixed_dense1pct": lambda: (np.concatenate([
        make_data("uniform", (1014, 7000), 0.0),
        make_data("walk", (10, 7000), 10.0),
    ]), RiceConfig(8, 7000)),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default=None)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    names = args.only.split(",") if args.only else list(CONFIGS)
    sync_cost = _sync_cost()
    rows = []
    for name in names:
        x, cfg = CONFIGS[name]()
        iters = max(3, min(args.iters, int(3e8 / x.nbytes) + 3))
        row = bench_config(name, x, cfg, iters, sync_cost)
        rows.append(row)
        print(json.dumps(row), flush=True)
    report = {
        "metric": "device codec throughput across published geometries",
        "platform": jax.devices()[0].platform,
        "sync_cost_ms": round(sync_cost * 1e3, 2),
        "rows": rows,
    }
    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=1)
    print(json.dumps({"summary": {r["config"]: r["encode_GBps"]
                                  for r in rows}}))


if __name__ == "__main__":
    main()
