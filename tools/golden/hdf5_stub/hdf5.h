/* Minimal stand-in for hdf5.h, used ONLY to compile the reference codec
 * (/root/reference/src/deltaRice.c) out-of-tree into a ctypes-callable test
 * oracle. It declares just the public H5Z types/macros that file touches.
 * No HDF5 functionality is provided: H5Zregister is a stub in harness.c.
 *
 * This mirrors the public, stable HDF5 1.8+ H5Z ABI (see HDF5's H5Zpublic.h
 * documentation); it is written from the documented ABI, not copied.
 */
#ifndef DELTARICE_GOLDEN_HDF5_STUB_H
#define DELTARICE_GOLDEN_HDF5_STUB_H

#include <stddef.h>

typedef int herr_t;
typedef long long hid_t;
typedef int H5Z_filter_t;

#define H5Z_CLASS_T_VERS 1
#define H5Z_FLAG_REVERSE 0x0100
#define H5Z_FLAG_OPTIONAL 0x0001

typedef herr_t (*H5Z_can_apply_func_t)(hid_t dcpl_id, hid_t type_id, hid_t space_id);
typedef herr_t (*H5Z_set_local_func_t)(hid_t dcpl_id, hid_t type_id, hid_t space_id);
typedef size_t (*H5Z_func_t)(unsigned int flags, size_t cd_nelmts,
                             const unsigned int cd_values[], size_t nbytes,
                             size_t *buf_size, void **buf);

typedef struct H5Z_class2_t {
    int version;
    H5Z_filter_t id;
    unsigned encoder_present;
    unsigned decoder_present;
    const char *name;
    H5Z_can_apply_func_t can_apply;
    H5Z_set_local_func_t set_local;
    H5Z_func_t filter;
} H5Z_class2_t;

typedef H5Z_class2_t H5Z_class_t;

herr_t H5Zregister(const void *cls);

#endif
