/* Read a Delta-Rice-compressed HDF5 dataset with ZERO filter code.
 *
 * This program never mentions filter 32025: HDF5 >= 1.8.11 discovers the
 * filter by scanning HDF5_PLUGIN_PATH and dlopen-ing the plugin library,
 * which exposes H5PLget_plugin_type / H5PLget_plugin_info
 * (deltarice_tpu/native/src/h5z_deltarice.c — role parity with the
 * reference's deltaRice_h5plugin.c). Install the plugin with
 *
 *     python -m deltarice_tpu.native install --plugin-dir DIR
 *     export HDF5_PLUGIN_PATH=DIR
 *
 * Build (no HDF5 dev headers needed, see dr_hdf5_min.h):
 *     cc dr_plugin_read.c -o dr_plugin_read /usr/lib/.../libhdf5*.so
 *
 * Usage: dr_plugin_read FILE DATASET N_INT16
 *   reads the first N_INT16 int16 values and prints their sum, so a
 *   caller can verify the decode happened (exit 1 on any failure).
 */
#include <stdio.h>
#include <stdlib.h>

#include "dr_hdf5_min.h"

int main(int argc, char **argv) {
  if (argc != 4)
    return fprintf(stderr, "usage: %s FILE DATASET N\n", argv[0]), 2;
  const char *path = argv[1];
  const char *name = argv[2];
  long n = strtol(argv[3], NULL, 10);
  if (n <= 0) return fprintf(stderr, "bad N\n"), 2;
  if (H5open() < 0) return fprintf(stderr, "H5open failed\n"), 1;
  hid_t f = H5Fopen(path, H5F_ACC_RDONLY, H5P_DEFAULT);
  if (f < 0) return fprintf(stderr, "H5Fopen failed\n"), 1;
  hid_t dset = H5Dopen(f, name, H5P_DEFAULT);
  if (dset < 0) return fprintf(stderr, "H5Dopen failed\n"), 1;
  short *buf = (short *)malloc((size_t)n * sizeof(short));
  if (!buf) return fprintf(stderr, "oom\n"), 1;
  /* H5S_ALL reads the whole dataset; the caller sizes N to match. */
  if (H5Dread(dset, H5T_NATIVE_SHORT, H5S_ALL, H5S_ALL, H5P_DEFAULT, buf) <
      0)
    return fprintf(stderr, "H5Dread failed (plugin not found?)\n"), 1;
  long long sum = 0;
  for (long i = 0; i < n; i++) sum += buf[i];
  printf("sum=%lld\n", sum);
  free(buf);
  H5Dclose(dset);
  H5Fclose(f);
  return 0;
}
