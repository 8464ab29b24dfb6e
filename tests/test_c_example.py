"""Compile and run the pure-C HDF5 example, then cross-read its file.

Role parity with the reference's C integration example
(``/root/reference/examples/testCode.c``, which CONTRIBUTING requires to
keep passing): the C program registers filter 32025 into a *system* HDF5
(not h5py's bundled copy), writes a chunked dataset through the standard
filter pipeline, and self-verifies. We additionally reopen the file from
Python with this framework's codec to prove C-written files are readable
across HDF5 builds.
"""

from __future__ import annotations

import glob
import shutil
import subprocess
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent
EXAMPLE = REPO / "examples" / "c" / "dr_roundtrip.c"


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


@pytest.fixture(scope="module")
def example_binary(tmp_path_factory):
    cc = shutil.which("cc") or shutil.which("gcc")
    hdf5 = _system_hdf5()
    if cc is None or hdf5 is None:
        pytest.skip("needs a C compiler and a system libhdf5 runtime")
    from deltarice_tpu import native

    if not native.is_built():
        native.build()
    out = tmp_path_factory.mktemp("cexample") / "dr_roundtrip"
    subprocess.run(
        [cc, str(EXAMPLE), "-o", str(out), str(native.library_path()), hdf5],
        check=True,
        capture_output=True,
        text=True,
    )
    return out


def test_c_example_roundtrips(example_binary, tmp_path):
    h5file = tmp_path / "c_written.h5"
    res = subprocess.run(
        [str(example_binary), str(h5file)],
        capture_output=True,
        text=True,
        env={"LD_LIBRARY_PATH": str(example_binary.parent)},
    )
    assert res.returncode == 0, res.stderr
    assert "round-trip OK" in res.stdout
    assert h5file.is_file()


def test_c_written_file_readable_from_python(example_binary, tmp_path):
    h5file = tmp_path / "c_written.h5"
    subprocess.run([str(example_binary), str(h5file)], check=True,
                   capture_output=True)

    import h5py

    from deltarice_tpu import h5 as drh5

    # regenerate the example's deterministic data (same recurrence)
    rows, cols = 512, 1024
    data = np.empty((rows, cols), np.int16)
    for r in range(rows):
        acc = np.int16(r - rows // 2)
        steps = ((r * 131 + np.arange(cols) * 7919) % 13 - 6).astype(np.int16)
        data[r] = (int(acc) + np.cumsum(steps.astype(np.int64))).astype(
            np.int16
        )

    with h5py.File(h5file, "r") as f:
        dset = f["waveforms"]
        assert dset.compression is None  # custom filter, not a named one
        got = drh5.read_dataset(dset)
    np.testing.assert_array_equal(got, data)
