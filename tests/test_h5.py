"""HDF5 direct-chunk integration: round trips and byte-level interop with
the reference filter (files we write must decompress under the stock plugin;
files the reference writes must read back here)."""

import numpy as np
import pytest

import deltarice_tpu as drt
from deltarice_tpu import h5 as drh5
from deltarice_tpu.config import H5FILTER
from deltarice_tpu.testing.oracle import ReferenceOracle, oracle_available

h5py = pytest.importorskip("h5py")

needs_oracle = pytest.mark.skipif(
    not oracle_available(), reason="reference oracle not available"
)


def _data(shape=(40, 700), seed=0, sigma=10):
    rng = np.random.default_rng(seed)
    return np.round(
        np.cumsum(rng.normal(0, sigma, shape), axis=-1)
    ).astype(np.int16)


def test_write_read_roundtrip(tmp_path):
    x = _data()
    cfg = drt.RiceConfig(8, 700)
    with h5py.File(tmp_path / "t.h5", "w") as f:
        drh5.write_dataset(f, "waveforms", x, cfg, chunks=(8, 700))
    with h5py.File(tmp_path / "t.h5", "r") as f:
        dset = f["waveforms"]
        # h5py can't name the (to it unknown) filter, but the dcpl must
        # carry our filter id + config so files are self-describing
        assert drh5.dataset_config(dset) == cfg
        got = drh5.read_dataset(dset)
    np.testing.assert_array_equal(got, x)


def test_edge_chunks_roundtrip(tmp_path):
    x = _data((37, 500), seed=1)  # 37 not divisible by 8
    cfg = drt.RiceConfig(8, 500)
    with h5py.File(tmp_path / "t.h5", "w") as f:
        drh5.write_dataset(f, "d", x, cfg, chunks=(8, 500))
    with h5py.File(tmp_path / "t.h5", "r") as f:
        got = drh5.read_dataset(f["d"])
    np.testing.assert_array_equal(got, x)


def test_config_stored_in_dcpl(tmp_path):
    cfg = drt.RiceConfig(16, 256)
    with h5py.File(tmp_path / "t.h5", "w") as f:
        drh5.write_dataset(f, "d", _data((16, 256), 2), cfg, chunks=(4, 256))
    with h5py.File(tmp_path / "t.h5", "r") as f:
        assert drh5.dataset_config(f["d"]) == cfg


@needs_oracle
def test_written_chunks_decode_under_reference_plugin(tmp_path):
    """Byte-level interop: every stored chunk stream must decompress with
    the reference C codec given only the dataset's cd_values — i.e. the file
    is readable by any HDF5 app with the stock deltarice plugin."""
    x = _data((32, 700), seed=3)
    cfg = drt.RiceConfig(8, 700)
    oracle = ReferenceOracle()
    with h5py.File(tmp_path / "t.h5", "w") as f:
        drh5.write_dataset(f, "d", x, cfg, chunks=(8, 700))
    with h5py.File(tmp_path / "t.h5", "r") as f:
        dset = f["d"]
        cd = drh5.dataset_config(dset).to_cd_values()
        for row in range(0, 32, 8):
            _mask, blob = dset.id.read_direct_chunk((row, 0))
            got = oracle.decompress(blob, cd)
            np.testing.assert_array_equal(
                got.reshape(8, 700), x[row : row + 8]
            )


@needs_oracle
def test_reference_written_file_reads_here(tmp_path):
    """Reverse interop: chunks compressed by the reference C codec, stored
    via direct-chunk writes (as the real plugin would through the filter
    pipeline), must read back through our device decoder."""
    x = _data((24, 512), seed=4)
    cfg = drt.RiceConfig(8, 512)
    oracle = ReferenceOracle()
    with h5py.File(tmp_path / "r.h5", "w") as f:
        dset = drh5.create_dataset(f, "d", x.shape, cfg, chunks=(8, 512))
        for row in range(0, 24, 8):
            blob = oracle.compress(x[row : row + 8], cfg.to_cd_values())
            dset.id.write_direct_chunk((row, 0), blob)
    with h5py.File(tmp_path / "r.h5", "r") as f:
        got = drh5.read_dataset(f["d"])
    np.testing.assert_array_equal(got, x)


@needs_oracle
def test_written_bytes_identical_to_reference(tmp_path):
    """Strongest interop claim: our compressed chunk bytes are *identical*
    to what the reference filter would produce for the same chunk."""
    x = _data((16, 300), seed=5)
    cfg = drt.RiceConfig(8, 300)
    oracle = ReferenceOracle()
    with h5py.File(tmp_path / "t.h5", "w") as f:
        drh5.write_dataset(f, "d", x, cfg, chunks=(4, 300))
    with h5py.File(tmp_path / "t.h5", "r") as f:
        dset = f["d"]
        for row in range(0, 16, 4):
            _mask, blob = dset.id.read_direct_chunk((row, 0))
            ref = oracle.compress(x[row : row + 4], cfg.to_cd_values())
            assert blob == ref, f"chunk at row {row} differs from reference"


def test_register_alias_import(tmp_path):
    """``import deltarice_tpu.register`` registers filter 32025 as an
    import side effect (drop-in for ``import deltaRice.h5``, reference
    /root/reference/src/h5.pyx:32-61) — after it, plain h5py writes and
    reads deltarice datasets through the standard filter pipeline."""
    import deltarice_tpu.register as reg

    assert reg.H5FILTER == 32025
    x = _data((8, 200), seed=11)
    cfg = drt.RiceConfig(8, 200)
    with h5py.File(tmp_path / "a.h5", "w") as f:
        f.create_dataset(
            "d", data=x, chunks=(4, 200),
            compression=reg.H5FILTER, compression_opts=cfg.to_cd_values(),
        )
    with h5py.File(tmp_path / "a.h5", "r") as f:
        assert f["d"].compression is None  # non-standard filter id
        np.testing.assert_array_equal(f["d"][...], x)
