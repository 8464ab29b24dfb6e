"""ctypes harness around the reference Delta-Rice C codec, used as a golden
test oracle for bit-exactness.

The reference implementation (david-mathews-1994/deltarice,
``src/deltaRice.c``) is compiled out-of-tree by ``tools/golden/build_golden.sh``
into ``.golden/libdeltarice_ref.so``. This wrapper calls its chunk-level entry
points directly:

* ``writeWholeCompressedByteString`` (``src/deltaRice.c:383``) — compress one
  HDF5 chunk worth of int16 samples.
* ``readWholeCompressedByteString`` (``src/deltaRice.c:301``) — decompress.

Both functions take ownership of a malloc'd buffer through ``void **buf`` and
replace it, so buffers are allocated with libc ``malloc`` and released with
libc ``free`` here.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path

import numpy as np

_REPO_ROOT = Path(__file__).resolve().parent.parent.parent
_LIB_PATH = _REPO_ROOT / ".golden" / "libdeltarice_ref.so"
_BUILD_SCRIPT = _REPO_ROOT / "tools" / "golden" / "build_golden.sh"


def _reference_present() -> bool:
    ref = os.environ.get("DELTARICE_REFERENCE", "/root/reference")
    return (Path(ref) / "src" / "deltaRice.c").is_file()


def oracle_available() -> bool:
    """True if the golden oracle library exists or can be built."""
    if _LIB_PATH.is_file():
        return True
    if not _reference_present():
        return False
    try:
        subprocess.run(
            ["sh", str(_BUILD_SCRIPT)], check=True,
            capture_output=True, text=True,
        )
    except (subprocess.CalledProcessError, OSError):
        return False
    return _LIB_PATH.is_file()


class ReferenceOracle:
    """Compress/decompress chunks through the reference C implementation."""

    def __init__(self) -> None:
        if not oracle_available():
            raise RuntimeError(
                "golden oracle unavailable: reference source not present and "
                f"{_LIB_PATH} not built"
            )
        self._libc = ctypes.CDLL(None)
        self._libc.malloc.restype = ctypes.c_void_p
        self._libc.malloc.argtypes = [ctypes.c_size_t]
        self._libc.free.argtypes = [ctypes.c_void_p]
        self._lib = ctypes.CDLL(str(_LIB_PATH))
        self._write = self._lib.writeWholeCompressedByteString
        self._write.restype = ctypes.c_int
        self._write.argtypes = [
            ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_uint),
            ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_size_t),
            ctypes.POINTER(ctypes.c_void_p),
        ]
        self._read = self._lib.readWholeCompressedByteString
        self._read.restype = ctypes.c_int
        self._read.argtypes = [
            ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_uint),
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_size_t),
            ctypes.POINTER(ctypes.c_void_p),
        ]

    @staticmethod
    def compress_is_safe(n_samples: int, waveform_length: int) -> bool:
        """Whether the reference's compress-side buffer math cannot overflow.

        The reference allocates ``nbytes*2 + numWaves + 1`` *bytes*
        (``src/deltaRice.c:411-412``) but its OpenMP scratch layout places
        wave i at uint32 offset ``i*wavelength + i + 1`` (``:421``), so small
        chunks and short leftover segments overrun the heap. Tests must not
        drive the oracle into that UB; this reproduces the exact bound with
        the worst-case 25-bit-per-sample output size.
        """
        n = int(n_samples)
        length = n if waveform_length == -1 else int(waveform_length)
        nwaves = n // length
        leftover = n - nwaves * length
        if leftover:
            nwaves += 1
        last_len = leftover or length
        have_bytes = 4 * n + nwaves + 1
        scratch_end_words = (nwaves - 1) * (length + 1) + 2 + (25 * last_len + 31) // 32
        return 4 * scratch_end_words <= have_bytes

    def _run(self, fn, payload: bytes, cd_values, nbytes_ctype):
        cd = np.asarray(cd_values, dtype=np.uint32)
        cd_arr = (ctypes.c_uint * max(len(cd), 1))(*cd.tolist())
        n = len(payload)
        buf = self._libc.malloc(max(n, 1))
        if not buf:
            raise MemoryError
        ctypes.memmove(buf, payload, n)
        buf_p = ctypes.c_void_p(buf)
        size = ctypes.c_size_t(n)
        rc = fn(len(cd), cd_arr, nbytes_ctype(n), ctypes.byref(size), ctypes.byref(buf_p))
        if rc < 0:
            self._libc.free(buf_p)
            raise RuntimeError(f"reference codec failed rc={rc}")
        out = ctypes.string_at(buf_p.value, size.value)
        self._libc.free(buf_p)
        return out

    def compress(self, data: np.ndarray | bytes, cd_values=()) -> bytes:
        """Compress raw int16 samples (or bytes) exactly like the reference
        HDF5 filter would for one chunk, returning the framed byte stream."""
        if isinstance(data, np.ndarray):
            data = data.tobytes()
        return self._run(self._write, data, cd_values, ctypes.c_size_t)

    def decompress(self, stream: bytes, cd_values=()) -> np.ndarray:
        out = self._run(self._read, stream, cd_values, ctypes.c_int)
        return np.frombuffer(out, dtype=np.int16)
