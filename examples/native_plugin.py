"""Use the native C filter through the standard HDF5 pipeline — the
workflow of a non-JAX HDF5 application (reference: examples/testCode.c)."""

import numpy as np
import h5py

from deltarice_tpu import H5FILTER, h5 as drh5


def main():
    assert drh5.register_h5_filter(), "native filter build/registration failed"

    data = np.arange(-32768, 32768, dtype=np.int16).reshape(16, 4096)
    with h5py.File("native.h5", "w") as f:
        # plain h5py + filter pipeline: the C codec runs inside libhdf5
        f.create_dataset(
            "d", data=data, chunks=(4, 4096), compression=H5FILTER,
            compression_opts=(8, 4096), allow_unknown_filter=True,
        )
    with h5py.File("native.h5", "r") as f:
        assert np.array_equal(f["d"][()], data)
    print("ok: full int16 range through the C filter pipeline")


if __name__ == "__main__":
    main()
