// Minimal declarations of the public HDF5 dynamic-filter-plugin ABI, written
// from the documented HDF5 interface (H5Zpublic.h / H5PLextern.h semantics;
// see https://docs.hdfgroup.org/ "Filters" and "Dynamically Loaded Plugins").
// Declaring the ABI locally avoids a build-time dependency on HDF5 headers —
// the plugin only *exports* symbols that libhdf5 looks up at dlopen time and
// never calls into libhdf5 itself (allocation uses the process heap, which is
// safe on Linux: a single CRT heap is shared with libhdf5).
#pragma once

#include <stddef.h>

#if defined(__cplusplus)
extern "C" {
#endif

typedef int H5Z_filter_t;

// H5Zpublic.h contract values.
#define H5Z_CLASS_T_VERS 1
#define H5Z_FLAG_REVERSE 0x0100u

// Plugin type enumeration (H5PLpublic.h): filters are type 0.
typedef enum H5PL_type_t {
    H5PL_TYPE_ERROR = -1,
    H5PL_TYPE_FILTER = 0,
    H5PL_TYPE_NONE = 1
} H5PL_type_t;

// The filter callback: transforms *buf in place (possibly reallocating),
// returns the number of valid output bytes, or 0 on failure.
typedef size_t (*H5Z_func_t)(unsigned int flags, size_t cd_nelmts,
                             const unsigned int cd_values[], size_t nbytes,
                             size_t* buf_size, void** buf);

// can_apply/set_local take three hid_t (int64) arguments; the vbz filter
// leaves both null, so opaque pointer types suffice for the struct layout.
typedef long long hid_t;
typedef int herr_t;
typedef int htri_t;
typedef htri_t (*H5Z_can_apply_func_t)(hid_t dcpl_id, hid_t type_id,
                                       hid_t space_id);
typedef herr_t (*H5Z_set_local_func_t)(hid_t dcpl_id, hid_t type_id,
                                       hid_t space_id);

typedef struct H5Z_class2_t {
    int version;
    H5Z_filter_t id;
    unsigned encoder_present;
    unsigned decoder_present;
    const char* name;
    H5Z_can_apply_func_t can_apply;
    H5Z_set_local_func_t set_local;
    H5Z_func_t filter;
} H5Z_class2_t;

#if defined(__cplusplus)
}
#endif
