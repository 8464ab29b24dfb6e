"""Real-chip scaling evidence within one chip (VERDICT r02 item 7).

Multi-chip hardware isn't attachable here, so the scaling story rests on
three measurable claims, which this harness pins on the real chip:

1. **mesh-of-1 overhead** — the sharded (`shard_map`) codec costs the
   same as the unsharded program on identical data, i.e. the sharding
   machinery adds no per-device serialization;
2. **pipeline utilization** — the windowed HDF5 path (`h5.write_dataset`
   / `h5.read_dataset`, one-window-deep dispatch/collect overlap) keeps
   the device codec busy relative to the host+file work, measured as
   device-time / wall-time;
3. **host-transfer context** — device->host bandwidth, so (2) can be
   read against the environment's transfer ceiling (this dev relay moves
   tens of MB/s; production TPU hosts move GB/s).

Usage: python tools/singlechip_scaling.py [--out SCALING_CHIP.json]
Appends/merges into SCALING.json-style artifacts via --merge-into.
"""

from __future__ import annotations

import argparse
import json
import os
import tempfile
import time

import numpy as np

import jax
import jax.numpy as jnp

from deltarice_tpu.codec import decode_segments, encode_segments
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
    while True:
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        _sync(out)
        el = time.perf_counter() - t0
        if el - sync_cost > max(4 * sync_cost, 0.15) or iters >= 1024:
            return max(el - sync_cost, 1e-9) / iters
        iters *= 4


def _method():
    return "pallas" if jax.default_backend() == "tpu" else "segsum"


def mesh_of_one_overhead(cfg, nseg, length, sync_cost, iters=8):
    rng = np.random.default_rng(0)
    x = np.round(
        np.cumsum(rng.normal(0, 10, (nseg, length)), axis=-1)
    ).astype(np.int16)
    nvalid = np.full(nseg, length, np.int32)
    mw = cfg.max_words(length)

    xd = jnp.asarray(x)
    nvd = jnp.asarray(nvalid)
    t_plain_enc = _timeit(
        lambda: encode_segments(xd, nvd, cfg, mw, _method()),
        iters=iters, sync_cost=sync_cost,
    )
    words, nwords = encode_segments(xd, nvd, cfg, mw, _method())
    w = -(-(int(np.asarray(nwords).max()) + 1) // 256) * 256
    wd = jnp.asarray(np.asarray(words[:, :w]))
    t_plain_dec = _timeit(
        lambda: decode_segments(wd, length, cfg, "auto"),
        iters=iters, sync_cost=sync_cost,
    )

    mesh = chunk_mesh(jax.devices()[:1])
    b = put_sharded(x[None], mesh)
    nv = put_sharded(nvalid[None], mesh)
    t_mesh_enc = _timeit(
        lambda: encode_chunks_sharded(b, nv, cfg, mesh, mw),
        iters=iters, sync_cost=sync_cost,
    )
    wmesh = put_sharded(np.asarray(words[:, :w])[None], mesh)
    t_mesh_dec = _timeit(
        lambda: decode_chunks_sharded(wmesh, length, cfg, mesh),
        iters=iters, sync_cost=sync_cost,
    )
    return {
        "plain_enc_ms": round(t_plain_enc * 1e3, 3),
        "mesh1_enc_ms": round(t_mesh_enc * 1e3, 3),
        "plain_dec_ms": round(t_plain_dec * 1e3, 3),
        "mesh1_dec_ms": round(t_mesh_dec * 1e3, 3),
        "enc_overhead": round(t_mesh_enc / t_plain_enc - 1, 4),
        "dec_overhead": round(t_mesh_dec / t_plain_dec - 1, 4),
    }


def pipeline_utilization(cfg, nseg, length, n_chunks, sync_cost):
    import h5py

    from deltarice_tpu import h5 as drh5

    rng = np.random.default_rng(1)
    data = np.round(
        np.cumsum(rng.normal(0, 10, (n_chunks * nseg, length)), axis=-1)
    ).astype(np.int16)
    nvalid = np.full(nseg * n_chunks, length, np.int32)
    mw = cfg.max_words(length)
    # pure device time for the same total work (queued dispatches)
    xd = jnp.asarray(data.reshape(n_chunks * nseg, length))
    t_dev_enc = _timeit(
        lambda: encode_segments(xd, jnp.asarray(nvalid), cfg, mw, _method()),
        iters=4, sync_cost=sync_cost,
    )

    tmp = tempfile.mkdtemp(prefix="drscale", dir="/dev/shm"
                           if os.path.isdir("/dev/shm") else None)
    path = os.path.join(tmp, "t.h5")
    t0 = time.perf_counter()
    with h5py.File(path, "w") as f:
        drh5.write_dataset(f, "d", data, cfg, chunks=(nseg, length))
    t_write = time.perf_counter() - t0
    t0 = time.perf_counter()
    with h5py.File(path, "r") as f:
        out = drh5.read_dataset(f["d"])
    t_read = time.perf_counter() - t0
    assert np.array_equal(out, data)
    nbytes = data.nbytes
    return {
        "batch_MB": round(nbytes / 1e6, 1),
        "device_encode_ms_per_batch": round(t_dev_enc * 1e3, 2),
        "file_write_MBps": round(nbytes / t_write / 1e6, 1),
        "file_read_MBps": round(nbytes / t_read / 1e6, 1),
        "write_device_utilization": round(
            (t_dev_enc * 1) / t_write, 4
        ),
    }


def d2h_bandwidth():
    a = jnp.zeros((8 << 20,), jnp.uint8)  # 8 MB
    np.asarray(a)  # warm
    t0 = time.perf_counter()
    np.asarray(a + 1)
    dt = time.perf_counter() - t0
    return round(8 / dt, 1)  # MB/s


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nseg", type=int, default=1024)
    ap.add_argument("--length", type=int, default=7000)
    ap.add_argument("--chunks", type=int, default=4)
    ap.add_argument("--out", default=None)
    ap.add_argument("--merge-into", default=None,
                    help="existing SCALING.json to extend")
    args = ap.parse_args()
    cfg = RiceConfig(8, args.length)
    sc = _sync_cost()
    report = {
        "platform": jax.default_backend(),
        "sync_cost_ms": round(sc * 1e3, 2),
        "mesh_of_one": mesh_of_one_overhead(cfg, args.nseg, args.length, sc),
        "pipeline": pipeline_utilization(cfg, args.nseg, args.length,
                                         args.chunks, sc),
        "d2h_MBps": d2h_bandwidth(),
    }
    print(json.dumps(report))
    target = args.merge_into or args.out
    if args.merge_into and os.path.exists(args.merge_into):
        base = json.load(open(args.merge_into))
        base["single_chip"] = report
        report = base
    if target:
        with open(target, "w") as f:
            json.dump(report, f, indent=1)


if __name__ == "__main__":
    main()
