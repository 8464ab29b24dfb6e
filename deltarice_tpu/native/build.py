"""Build the native Delta-Rice filter library with the system toolchain.

Usage: ``python -m deltarice_tpu.native.build [-v]``

No HDF5 development install is required: the filter declares the minimal
HDF5 ABI locally and resolves symbols at runtime (see h5z_deltarice.c).
"""

from __future__ import annotations

import shutil
import subprocess
import sys
from pathlib import Path

_HERE = Path(__file__).resolve().parent
_SRC = _HERE / "src"
_LIB = _HERE / "lib" / "libh5deltarice_tpu.so"


def build_library(verbose: bool = False) -> Path:
    cc = shutil.which("cc") or shutil.which("gcc")
    if cc is None:
        raise RuntimeError("no C compiler found")
    _LIB.parent.mkdir(exist_ok=True)
    cmd = [
        cc, "-O3", "-fPIC", "-shared", "-fopenmp", "-Wall",
        str(_SRC / "dr_codec.c"), str(_SRC / "h5z_deltarice.c"),
        "-o", str(_LIB), "-ldl",
    ]
    res = subprocess.run(cmd, capture_output=True, text=True)
    if verbose or res.returncode != 0:
        sys.stderr.write(res.stdout + res.stderr)
    if res.returncode != 0:
        raise RuntimeError(f"native build failed (rc={res.returncode})")
    return _LIB


if __name__ == "__main__":
    path = build_library(verbose="-v" in sys.argv)
    print(f"built {path}")
