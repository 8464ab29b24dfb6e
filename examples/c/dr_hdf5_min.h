/* Minimal HDF5 C-API declarations for the pure-C example.
 *
 * Normally a C application includes <hdf5.h> and links -lhdf5. This
 * header exists so the example also builds on machines that have an
 * HDF5 *runtime* (e.g. a distro libhdf5_serial.so) but no development
 * headers. It declares, from the documented stable HDF5 1.10+ ABI, only
 * the handful of entry points the example touches. If you have a real
 * HDF5 install, compile with -DDR_HAVE_HDF5_H instead and this header
 * defers to <hdf5.h>.
 */
#ifndef DR_HDF5_MIN_H
#define DR_HDF5_MIN_H

#ifdef DR_HAVE_HDF5_H
#include <hdf5.h>
#else

#include <stddef.h>
#include <stdint.h>

typedef int64_t hid_t; /* HDF5 >= 1.10 */
typedef int herr_t;
typedef unsigned long long hsize_t;

#define H5F_ACC_RDONLY 0x0000u
#define H5F_ACC_TRUNC 0x0002u
#define H5P_DEFAULT ((hid_t)0)
#define H5S_ALL ((hid_t)0)
#define H5Z_FLAG_MANDATORY 0x0000u

/* Property-list class and datatype handles are library globals,
 * initialised by H5open(). The public macros map onto the *_g names. */
extern hid_t H5P_CLS_DATASET_CREATE_ID_g;
extern hid_t H5T_NATIVE_SHORT_g;
#define H5P_DATASET_CREATE H5P_CLS_DATASET_CREATE_ID_g
#define H5T_NATIVE_SHORT H5T_NATIVE_SHORT_g

herr_t H5open(void);
hid_t H5Fcreate(const char *name, unsigned flags, hid_t fcpl, hid_t fapl);
hid_t H5Fopen(const char *name, unsigned flags, hid_t fapl);
herr_t H5Fclose(hid_t f);
hid_t H5Screate_simple(int rank, const hsize_t *dims, const hsize_t *max);
herr_t H5Sclose(hid_t s);
hid_t H5Pcreate(hid_t cls);
herr_t H5Pset_chunk(hid_t plist, int ndims, const hsize_t *dims);
herr_t H5Pset_filter(hid_t plist, int filter, unsigned flags,
                     size_t cd_nelmts, const unsigned cd_values[]);
herr_t H5Pclose(hid_t p);
hid_t H5Dcreate2(hid_t loc, const char *name, hid_t type, hid_t space,
                 hid_t lcpl, hid_t dcpl, hid_t dapl);
hid_t H5Dopen2(hid_t loc, const char *name, hid_t dapl);
herr_t H5Dwrite(hid_t dset, hid_t memtype, hid_t memspace, hid_t filespace,
                hid_t xfer, const void *buf);
herr_t H5Dread(hid_t dset, hid_t memtype, hid_t memspace, hid_t filespace,
               hid_t xfer, void *buf);
herr_t H5Dclose(hid_t d);

#define H5Dcreate H5Dcreate2
#define H5Dopen H5Dopen2

#endif /* DR_HAVE_HDF5_H */
#endif /* DR_HDF5_MIN_H */
