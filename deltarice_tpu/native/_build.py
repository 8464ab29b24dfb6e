"""Build the native Delta-Rice filter library with the system toolchain.

Usage: ``python -m deltarice_tpu.native build [-v]``

No HDF5 development install is required: the filter declares the minimal
HDF5 ABI locally and resolves symbols at runtime (see h5z_deltarice.c).

Platform handling mirrors the reference build's matrix
(``/root/reference/setup.py:35,48-51``: MSVC flags on Windows, OpenMP
off by default on macOS where Apple clang lacks ``-fopenmp``): Linux
gets ``-fopenmp -ldl``; macOS builds a ``.dylib`` without OpenMP unless
a libomp-capable compiler is detected; Windows/MSVC builds a ``.dll``
with ``/O2 /openmp`` through ``cl.exe`` when present.
"""

from __future__ import annotations

import shutil
import subprocess
import sys
from pathlib import Path

_HERE = Path(__file__).resolve().parent
_SRC = _HERE / "src"

if sys.platform == "win32":  # pragma: no cover - not exercised in CI image
    _LIB_BASENAME = "h5deltarice_tpu.dll"
elif sys.platform == "darwin":  # pragma: no cover
    _LIB_BASENAME = "libh5deltarice_tpu.dylib"
else:
    _LIB_BASENAME = "libh5deltarice_tpu.so"

_LIB = _HERE / "lib" / _LIB_BASENAME

_SOURCES = [_SRC / "dr_codec.c", _SRC / "h5z_deltarice.c"]


def _openmp_works(cc: str) -> bool:
    """Probe whether `cc` accepts -fopenmp (Apple clang does not)."""
    res = subprocess.run(
        [cc, "-fopenmp", "-x", "c", "-", "-o", "/dev/null", "-shared"],
        input="int main(void){return 0;}",
        capture_output=True,
        text=True,
    )
    return res.returncode == 0


def _build_cmd(cc: str) -> list[str]:
    if sys.platform == "win32":  # pragma: no cover
        return [
            cc, "/nologo", "/O2", "/openmp", "/LD",
            *[str(s) for s in _SOURCES],
            f"/Fe:{_LIB}",
        ]
    cmd = [cc, "-O3", "-fPIC", "-shared", "-Wall"]
    if sys.platform == "darwin":  # pragma: no cover
        if _openmp_works(cc):
            cmd.append("-fopenmp")
        cmd += [str(s) for s in _SOURCES]
        cmd += ["-o", str(_LIB)]
        return cmd
    cmd.append("-fopenmp")
    cmd += [str(s) for s in _SOURCES]
    # -z nodelete: HDF5's plugin loader dlcloses filter plugins at H5close;
    # unmapping this library would also unmap its libgomp dependency while
    # OpenMP worker threads are still parked in it, crashing the host app
    # at exit (observed with HDF5 1.10 + HDF5_PLUGIN_PATH loading).
    cmd += ["-o", str(_LIB), "-ldl", "-Wl,-z,nodelete"]
    return cmd


def build_library(verbose: bool = False) -> Path:
    if sys.platform == "win32":  # pragma: no cover
        cc = shutil.which("cl")
    else:
        cc = shutil.which("cc") or shutil.which("gcc") or shutil.which("clang")
    if cc is None:
        raise RuntimeError("no C compiler found")
    _LIB.parent.mkdir(exist_ok=True)
    res = subprocess.run(_build_cmd(cc), capture_output=True, text=True)
    if verbose or res.returncode != 0:
        sys.stderr.write(res.stdout + res.stderr)
    if res.returncode != 0:
        raise RuntimeError(f"native build failed (rc={res.returncode})")
    return _LIB


if __name__ == "__main__":
    path = build_library(verbose="-v" in sys.argv)
    print(f"built {path}")
