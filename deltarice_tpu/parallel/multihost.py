"""Multi-host (pod-slice) chunk pipeline.

The reference has no distributed story (OpenMP only; MPI-HDF5 explicitly
unsupported). Here multi-host scaling is pure data parallelism: every host
feeds its local shard of the chunk batch to the global mesh, the codec runs
with zero inter-chip communication (chunks are independent bitstreams by
format), and the only collective is the gather of (compressed words, word
counts) to the writer host, in file order.

Single-process usage works unchanged (the "gather" is a no-op view); under
``jax.distributed`` the same code runs SPMD on every host.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..config import RiceConfig
from ..codec import frame_stream
from .sharded import CHUNK_AXIS, chunk_mesh, encode_chunks_sharded, put_sharded


def initialize_distributed(**kwargs) -> None:
    """``jax.distributed.initialize`` passthrough (idempotent)."""
    if jax.process_count() == 1 and not kwargs:
        try:
            jax.distributed.initialize()
        except Exception:
            pass  # single-process / already initialized
    elif kwargs:
        jax.distributed.initialize(**kwargs)


def encode_chunks_multihost(batch: np.ndarray, cfg: RiceConfig,
                            mesh=None) -> list[bytes] | None:
    """Encode a (num_chunks, segments, L) batch across all hosts' devices
    and return the framed per-chunk byte streams on process 0 (None on
    other processes).

    ``batch`` is the GLOBAL batch; every process must pass the same shapes
    (the values only need to be correct for its own shard when running
    multi-process with ``jax.make_array_from_process_local_data``-style
    feeding; single-process callers just pass the whole array).
    """
    mesh = mesh or chunk_mesh()
    nchunks, nseg, length = batch.shape
    ndev = mesh.devices.size
    pad = (-nchunks) % ndev
    if pad:
        batch = np.concatenate(
            [batch, np.zeros((pad, nseg, length), batch.dtype)], axis=0
        )
    nvalid = np.full((batch.shape[0], nseg), length, dtype=np.int32)

    words, nwords = encode_chunks_sharded(
        put_sharded(batch, mesh), put_sharded(nvalid, mesh), cfg, mesh,
        cfg.max_words(length),
    )

    # gather to the writer: fully-addressable single-process arrays convert
    # directly; multi-process needs a process-level allgather
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        words = multihost_utils.process_allgather(words, tiled=True)
        nwords = multihost_utils.process_allgather(nwords, tiled=True)
        if jax.process_index() != 0:
            return None
    words = np.asarray(words)
    nwords = np.asarray(nwords)
    total = nseg * length
    return [
        frame_stream(total, words[c], nwords[c]) for c in range(nchunks)
    ]
