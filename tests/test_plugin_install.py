"""Turnkey plugin deployment: HDF5_PLUGIN_PATH auto-loading.

The reference installs its plugin with ``setup.py install --h5plugin
--h5plugin-dir=...`` so that HDF5 applications with *no* registration code
read its files (``/root/reference/setup.py:186-227``). This test proves the
same property end-to-end here: ``install_plugin`` copies the library into a
plugin directory, a C program that never mentions filter 32025 reads a
file written by this framework, and HDF5's dynamic-plugin scan does the
rest.
"""

from __future__ import annotations

import glob
import shutil
import subprocess
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent
READER = REPO / "examples" / "c" / "dr_plugin_read.c"


def _system_hdf5() -> str | None:
    for pat in (
        "/usr/lib/*/libhdf5_serial.so*",
        "/usr/lib/*/libhdf5.so*",
        "/usr/lib64/libhdf5.so*",
    ):
        hits = sorted(glob.glob(pat))
        if hits:
            return hits[0]
    return None


def test_default_plugin_dir_env(monkeypatch, tmp_path):
    from deltarice_tpu.native.install import default_plugin_dir

    monkeypatch.setenv("HDF5_PLUGIN_PATH", f"{tmp_path}:/elsewhere")
    assert default_plugin_dir() == tmp_path
    monkeypatch.delenv("HDF5_PLUGIN_PATH")
    assert str(default_plugin_dir()).endswith("hdf5/lib/plugin")


def test_install_plugin_copies_library(tmp_path):
    from deltarice_tpu import native
    from deltarice_tpu.native.install import install_plugin

    if not native.is_built():
        try:
            native.build()
        except RuntimeError:
            pytest.skip("no C compiler")
    dest = install_plugin(tmp_path / "plugins")
    assert dest.is_file()
    assert dest.parent == tmp_path / "plugins"
    assert dest.stat().st_size == native.library_path().stat().st_size


def test_c_reader_without_registration(tmp_path):
    """A C app with zero filter code reads our file via HDF5_PLUGIN_PATH."""
    cc = shutil.which("cc") or shutil.which("gcc")
    hdf5 = _system_hdf5()
    if cc is None or hdf5 is None:
        pytest.skip("needs a C compiler and a system libhdf5 runtime")
    h5py = pytest.importorskip("h5py")
    from deltarice_tpu import RiceConfig
    from deltarice_tpu import h5 as drh5
    from deltarice_tpu.native.install import install_plugin

    plugin_dir = tmp_path / "plugins"
    try:
        install_plugin(plugin_dir)
    except RuntimeError:
        pytest.skip("native build unavailable")

    rng = np.random.default_rng(0)
    data = np.cumsum(
        np.round(rng.normal(0, 8, (64, 512))), axis=-1
    ).astype(np.int16)
    h5file = tmp_path / "written_by_us.h5"
    with h5py.File(h5file, "w") as f:
        drh5.write_dataset(f, "waveforms", data, RiceConfig(8, 512),
                           chunks=(16, 512))

    reader = tmp_path / "dr_plugin_read"
    subprocess.run(
        [cc, str(READER), "-I", str(READER.parent), "-o", str(reader), hdf5],
        check=True, capture_output=True, text=True,
    )
    res = subprocess.run(
        [str(reader), str(h5file), "waveforms", str(data.size)],
        capture_output=True, text=True,
        env={"HDF5_PLUGIN_PATH": str(plugin_dir)},
    )
    assert res.returncode == 0, res.stderr
    assert res.stdout.strip() == f"sum={int(data.astype(np.int64).sum())}"
