/* Golden-oracle harness: provides the one HDF5 symbol the reference codec
 * references (H5Zregister) so /root/reference/src/deltaRice.c links into a
 * standalone shared library. The oracle never registers anything with HDF5;
 * tests call writeWholeCompressedByteString / readWholeCompressedByteString
 * directly through ctypes.
 */
#include <stddef.h>
#include "hdf5.h"

herr_t H5Zregister(const void *cls) {
    (void)cls;
    return 0;
}
