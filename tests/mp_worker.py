"""Worker process for the multi-process multihost test.

Launched by tests/test_multiprocess.py with argv:
    process_id num_processes coordinator_port output_dir

Runs the full multihost write+read pipeline over a 2-process /
8-CPU-device `jax.distributed` cluster (SURVEY §4's "simulated
multi-process mode") and byte-compares against the single-device codec.
"""

import pathlib
import sys

import numpy as np


def main() -> None:
    pid, n, port, outdir = (
        int(sys.argv[1]),
        int(sys.argv[2]),
        sys.argv[3],
        pathlib.Path(sys.argv[4]),
    )
    import jax

    jax.config.update("jax_cpu_collectives_implementation", "gloo")

    from deltarice_tpu.parallel.multihost import (
        decode_chunks_multihost,
        encode_chunks_multihost,
        initialize_distributed,
    )

    initialize_distributed(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=n,
        process_id=pid,
    )
    assert jax.process_count() == n, jax.process_count()
    assert jax.device_count() == n * len(jax.local_devices())

    import deltarice_tpu as drt
    from deltarice_tpu.parallel.sharded import chunk_mesh

    rng = np.random.default_rng(42)
    batch = np.round(
        np.cumsum(rng.normal(0, 10, (6, 8, 256)), axis=-1)
    ).astype(np.int16)
    cfg = drt.RiceConfig(8, 256)
    mesh = chunk_mesh()  # all 8 global devices, 4 per process

    # single-device reference bytes, computed identically on every process
    expected = [drt.compress(c, cfg) for c in batch]

    streams = encode_chunks_multihost(batch, cfg, mesh)
    if pid == 0:
        assert streams is not None
        for i, (got, want) in enumerate(zip(streams, expected)):
            assert got == want, f"chunk {i}: multihost bytes != single-device"
    else:
        assert streams is None

    out = decode_chunks_multihost(expected, cfg, mesh)
    if pid == 0:
        assert out is not None
        np.testing.assert_array_equal(
            out.reshape(batch.shape), batch
        )
        (outdir / "SUCCESS").write_text("ok")
    else:
        assert out is None


if __name__ == "__main__":
    main()
