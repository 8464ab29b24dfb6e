"""Scaling-efficiency harness (BASELINE config 5).

Measures encode+decode throughput of the sharded chunk codec at increasing
device counts with CONSTANT per-device load (weak scaling), and reports
efficiency = throughput(d) / (d * throughput(1)).

Usage:
    python tools/scaling_bench.py                 # virtual 8-device CPU mesh
    python tools/scaling_bench.py --platform tpu  # real chips (as available)
    python tools/scaling_bench.py --out SCALING.json

On a CPU host the 8 virtual devices share the physical cores, so aggregate
throughput saturates at the core count — the harness records
``physical_cores`` so efficiency numbers are read against that ceiling;
the virtual mesh still validates that the sharded program itself adds no
serialization (efficiency tracks the core ceiling, not worse).
"""

from __future__ import annotations

import argparse
import json
import os
import time

if "xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np

import jax
import jax.numpy as jnp

from deltarice_tpu.config import RiceConfig
from deltarice_tpu.parallel.sharded import (
    chunk_mesh,
    decode_chunks_sharded,
    encode_chunks_sharded,
    put_sharded,
)


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
    _sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    return max(time.perf_counter() - t0 - sync_cost, 1e-9) / iters


def measure(devices, cfg: RiceConfig, nseg: int, length: int,
            chunks_per_dev: int, iters: int, sync_cost: float):
    mesh = chunk_mesh(devices)
    d = len(devices)
    rng = np.random.default_rng(0)
    batch = np.round(
        np.cumsum(rng.normal(0, 10, (chunks_per_dev * d, nseg, length)),
                  axis=-1)
    ).astype(np.int16)
    nbytes = batch.nbytes
    nvalid = np.full(batch.shape[:2], length, dtype=np.int32)
    max_words = cfg.max_words(length)
    bd = put_sharded(batch, mesh)
    nv = put_sharded(nvalid, mesh)

    enc = lambda: encode_chunks_sharded(bd, nv, cfg, mesh, max_words)
    t_enc = _timeit(enc, iters=iters, sync_cost=sync_cost)
    words, nwords = enc()
    w = int(np.asarray(nwords).max()) + 1
    w = -(-w // 256) * 256
    wd = put_sharded(np.asarray(words)[:, :, :w], mesh)
    dec = lambda: decode_chunks_sharded(wd, length, cfg, mesh)
    t_dec = _timeit(dec, iters=iters, sync_cost=sync_cost)

    # round-trip spot check on the first chunk
    out = np.asarray(dec()[0])
    assert np.array_equal(out, batch[0]), "sharded round-trip failed"
    return nbytes / t_enc / 1e9, nbytes / t_dec / 1e9


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default="cpu", choices=["cpu", "tpu"])
    ap.add_argument("--devices", default=None,
                    help="comma-separated device counts (default 1,2,4,..N)")
    ap.add_argument("--nseg", type=int, default=64)
    ap.add_argument("--length", type=int, default=7000)
    ap.add_argument("--chunks-per-dev", type=int, default=2)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    devs = jax.devices(args.platform)
    if args.devices:
        counts = [int(c) for c in args.devices.split(",")]
    else:
        counts = [1]
        while counts[-1] * 2 <= len(devs):
            counts.append(counts[-1] * 2)
    cfg = RiceConfig(8, args.length)
    sync_cost = _sync_cost()

    rows = []
    for d in counts:
        enc_gbps, dec_gbps = measure(
            devs[:d], cfg, args.nseg, args.length, args.chunks_per_dev,
            args.iters, sync_cost,
        )
        hmean = 2.0 / (1.0 / enc_gbps + 1.0 / dec_gbps)
        rows.append({
            "devices": d,
            "encode_GBps": round(enc_gbps, 3),
            "decode_GBps": round(dec_gbps, 3),
            "harmonic_GBps": round(hmean, 3),
        })
    base = rows[0]["harmonic_GBps"]
    for r in rows:
        r["efficiency"] = round(r["harmonic_GBps"] / (r["devices"] * base), 3)
    report = {
        "metric": "weak-scaling encode+decode throughput vs device count",
        "platform": args.platform,
        "physical_cores": os.cpu_count(),
        "per_device_batch": [args.chunks_per_dev, args.nseg, args.length],
        "rows": rows,
    }
    print(json.dumps(report))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=1)


if __name__ == "__main__":
    main()
