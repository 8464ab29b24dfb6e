"""Bounded-memory streaming I/O: windowed chunk batches through
write_dataset / iter_chunks / read_dataset (BASELINE config 3 semantics —
the reference filter pipeline is chunk-at-a-time by construction,
``/root/reference/src/deltaRice.c:468-489``)."""

import os

import numpy as np
import pytest

import deltarice_tpu as drt
from deltarice_tpu import h5 as drh5

h5py = pytest.importorskip("h5py")


def _data(shape, seed=0):
    rng = np.random.default_rng(seed)
    return np.round(
        np.cumsum(rng.normal(0, 10, shape), axis=-1)
    ).astype(np.int16)


def test_windowed_write_matches_single_window(tmp_path):
    """Streaming in small windows must produce byte-identical files to one
    big batch (the window size is an execution detail, not a format one)."""
    x = _data((40, 300), seed=1)
    cfg = drt.RiceConfig(8, 300)
    paths = []
    for i, bc in enumerate((3, 1000)):
        p = tmp_path / f"t{i}.h5"
        with h5py.File(p, "w") as f:
            drh5.write_dataset(f, "d", x, cfg, chunks=(4, 300),
                               batch_chunks=bc)
        paths.append(p)
    blobs = []
    for p in paths:
        with h5py.File(p, "r") as f:
            dset = f["d"]
            blobs.append([
                dset.id.read_direct_chunk((r, 0))[1] for r in range(0, 40, 4)
            ])
    assert blobs[0] == blobs[1]


def test_windowed_read_roundtrip(tmp_path):
    x = _data((37, 256), seed=2)  # edge chunks too
    cfg = drt.RiceConfig(8, 256)
    with h5py.File(tmp_path / "t.h5", "w") as f:
        drh5.write_dataset(f, "d", x, cfg, chunks=(8, 256), batch_chunks=2)
    with h5py.File(tmp_path / "t.h5", "r") as f:
        got = drh5.read_dataset(f["d"], batch_chunks=3)
    np.testing.assert_array_equal(got, x)


def test_write_streams_from_h5py_dataset(tmp_path):
    """write_dataset accepts an open h5py dataset as the source (the CLI's
    multi-GB streaming path) without materializing it."""
    x = _data((24, 200), seed=3)
    with h5py.File(tmp_path / "src.h5", "w") as f:
        f.create_dataset("raw", data=x)
    cfg = drt.RiceConfig(8, 200)
    with h5py.File(tmp_path / "src.h5", "r") as fs, \
            h5py.File(tmp_path / "dst.h5", "w") as fd:
        drh5.write_dataset(fd, "d", fs["raw"], cfg, chunks=(8, 200),
                           batch_chunks=1)
    with h5py.File(tmp_path / "dst.h5", "r") as f:
        np.testing.assert_array_equal(drh5.read_dataset(f["d"]), x)


def test_iter_chunks_yields_every_chunk(tmp_path):
    x = _data((16, 128), seed=4)
    cfg = drt.RiceConfig(8, 128)
    with h5py.File(tmp_path / "t.h5", "w") as f:
        drh5.write_dataset(f, "d", x, cfg, chunks=(4, 128))
    with h5py.File(tmp_path / "t.h5", "r") as f:
        seen = dict(drh5.iter_chunks(f["d"], batch_chunks=2))
    assert sorted(seen) == [(r, 0) for r in range(0, 16, 4)]
    for (r, _), block in seen.items():
        np.testing.assert_array_equal(block, x[r : r + 4])


class _SyntheticSource:
    """Array-like that generates chunk rows on demand — lets the ~1 GB
    write test run without ever holding the dataset in host memory."""

    def __init__(self, rows: int, length: int):
        self.shape = (rows, length)
        self.dtype = np.dtype(np.int16)
        self.ndim = 2
        rng = np.random.default_rng(5)
        self._base = np.round(
            np.cumsum(rng.normal(0, 10, (32, length)), axis=-1)
        ).astype(np.int16)

    def __getitem__(self, sel):
        rs, _cs = sel
        rows = rs.stop - rs.start
        out = self._base[:rows].copy()
        out += np.int16(rs.start % 251)
        return out


@pytest.mark.skipif(
    os.environ.get("DELTARICE_BIG_TESTS") != "1",
    reason="~1 GB round trip; set DELTARICE_BIG_TESTS=1",
)
@pytest.mark.slow
def test_gigabyte_roundtrip_constant_memory(tmp_path):
    """~1 GB dataset through the windowed path: peak extra host memory is
    ~one window (64 chunks x 448 KB), not the dataset size."""
    rows, length = 72000, 7000  # 72000 x 7000 x 2 B ~= 1.0 GB
    cfg = drt.RiceConfig(8, length)
    src = _SyntheticSource(rows, length)
    path = tmp_path / "big.h5"
    with h5py.File(path, "w") as f:
        drh5.write_dataset(f, "d", src, cfg, chunks=(32, length))
    with h5py.File(path, "r") as f:
        dset = f["d"]
        assert dset.id.get_storage_size() < rows * length  # < 50% of raw
        seen = 0
        for off, block in drh5.iter_chunks(dset):
            np.testing.assert_array_equal(block, src[
                slice(off[0], off[0] + 32), slice(0, length)
            ])
            seen += 1
        assert seen == rows // 32
