"""Install the native filter plugin into an HDF5 plugin directory.

Role parity with the reference's ``setup.py install --h5plugin
[--h5plugin-dir=DIR]`` (``/root/reference/setup.py:44,186-227``, exercised
by its CI at ``.github/workflows/main.yml:56``): after installation, *any*
HDF5 >= 1.8.11 application — C, Fortran, h5py without this package —
auto-loads the filter through the dynamic-plugin mechanism with zero
registration code, because HDF5 scans the plugin directory and calls the
library's ``H5PLget_plugin_type`` / ``H5PLget_plugin_info`` entry points
(``h5z_deltarice.c``).

Usage::

    python -m deltarice_tpu.native install [--plugin-dir DIR] [-v]
    deltarice-tpu install-plugin [--plugin-dir DIR]

The directory defaults to the first entry of ``$HDF5_PLUGIN_PATH`` when
set, else HDF5's built-in default search path (``/usr/local/hdf5/lib/
plugin`` on Unix, ``%ALLUSERSPROFILE%\\hdf5\\lib\\plugin`` on Windows —
the same default the reference installer uses).
"""

from __future__ import annotations

import os
import shutil
import sys
from pathlib import Path


def default_plugin_dir() -> Path:
    env = os.environ.get("HDF5_PLUGIN_PATH")
    if env:
        first = env.split(os.pathsep)[0]
        if first:
            return Path(first)
    if sys.platform == "win32":  # pragma: no cover - POSIX CI image
        base = os.environ.get("ALLUSERSPROFILE", "C:\\ProgramData")
        return Path(base) / "hdf5" / "lib" / "plugin"
    return Path("/usr/local/hdf5/lib/plugin")


def install_plugin(plugin_dir: "str | Path | None" = None,
                   verbose: bool = False) -> Path:
    """Build (if needed) and copy the filter library into ``plugin_dir``.

    Returns the installed library path. Raises on build or copy failure
    (e.g. an unwritable system directory — rerun with a user-writable
    ``--plugin-dir`` and point ``HDF5_PLUGIN_PATH`` at it).
    """
    from . import build, is_built, library_path

    if not is_built():
        build(verbose=verbose)
    dest_dir = Path(plugin_dir) if plugin_dir else default_plugin_dir()
    dest_dir.mkdir(parents=True, exist_ok=True)
    src = library_path()
    dest = dest_dir / src.name
    shutil.copy2(src, dest)
    if verbose:
        sys.stderr.write(f"installed {dest}\n")
    return dest
