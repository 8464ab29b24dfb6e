"""Import-time filter registration — drop-in for ``import deltaRice.h5``.

The reference registers filter 32025 into h5py's HDF5 as a side effect of
``import deltaRice.h5`` (``/root/reference/src/h5.pyx:32-61``), so existing
user scripts only ever add one import line. This module gives the same
one-import experience:

    import deltarice_tpu.register   # registers the filter, or raises

After the import, plain ``h5py`` reads and writes of deltarice datasets go
through the standard HDF5 filter pipeline (served by the native C filter);
``H5FILTER`` is re-exported for ``compression=`` arguments.

Like the reference (RuntimeError when no h5py library exposes the HDF5
symbols or registration fails, ``h5.pyx:52-58``), a failed registration
raises instead of passing silently — scripts must not fall through to
writing uncompressed data. Use :func:`deltarice_tpu.h5.register_h5_filter`
directly for a bool-returning, non-raising variant.
"""

from __future__ import annotations

from .config import H5FILTER
from .h5 import register_h5_filter

__all__ = ["H5FILTER"]

if not register_h5_filter():
    raise RuntimeError(
        "deltarice_tpu: could not register HDF5 filter 32025 with h5py "
        "(h5py missing, native filter library not buildable, or no "
        "loadable libhdf5 found)"
    )
