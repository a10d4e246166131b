// HDF5 dynamic filter plugin for VBZ (filter ID 32020).
//
// Reproduces the reference plugin's contract (reference:
// vbz_plugin/vbz_plugin.cpp:97-261):
//   cd_values = [vbz_version, integer_size, use_zig_zag, zstd_level]
//   (zstd_level defaults to 1 when only 3 values are given); any error
//   returns 0 and leaves the caller's buffer untouched (H5Z contract).
//
// Backed by the native runtime codec (vbz_native.cpp). Built as a shared
// library; point HDF5_PLUGIN_PATH at its directory and h5py / h5repack /
// HDFView read and write vbz datasets transparently.

#include <cstdlib>
#include <cstdio>
#include <cstring>

#include "h5z_abi.h"
#include "vbz_native.h"

namespace {

constexpr H5Z_filter_t kVbzFilterId = 32020;

// cd_values indices (reference: vbz_plugin/vbz_plugin.h:7-10).
constexpr size_t kOptVersion = 0;
constexpr size_t kOptIntegerSize = 1;
constexpr size_t kOptZigZag = 2;
constexpr size_t kOptZstdLevel = 3;

// Env-gated debug logging with per-call XOR checksums, like the reference's
// VBZ_DEBUG build flag (reference: vbz_plugin/vbz_plugin.cpp:20-46) but
// runtime-switchable via VBZ_DEBUG_HDF=1.
bool debug_enabled() {
    static const bool enabled = [] {
        const char* e = std::getenv("VBZ_DEBUG_HDF");
        return e && *e && *e != '0';
    }();
    return enabled;
}

unsigned xor_checksum(const void* data, size_t n) {
    const unsigned char* p = static_cast<const unsigned char*>(data);
    unsigned acc = 0;
    for (size_t i = 0; i < n; ++i) acc ^= static_cast<unsigned>(p[i]) << (8 * (i & 3));
    return acc;
}

size_t vbz_h5_filter(unsigned int flags, size_t cd_nelmts,
                     const unsigned int cd_values[], size_t /*nbytes*/,
                     size_t* buf_size, void** buf) {
    if (cd_nelmts < 3) return 0;

    CompressionOptions options;
    options.vbz_version = cd_values[kOptVersion];
    options.integer_size = cd_values[kOptIntegerSize];
    options.perform_delta_zig_zag = cd_values[kOptZigZag] != 0;
    options.zstd_compression_level =
        (cd_nelmts > kOptZstdLevel) ? cd_values[kOptZstdLevel] : 1;

    if (debug_enabled()) {
        std::fprintf(stderr,
                     "vbz plugin: %s size=%zu checksum=%08x "
                     "(v%u int%u zz%d z%u)\n",
                     (flags & H5Z_FLAG_REVERSE) ? "decompress" : "compress",
                     *buf_size, xor_checksum(*buf, *buf_size),
                     options.vbz_version, options.integer_size,
                     options.perform_delta_zig_zag ? 1 : 0,
                     options.zstd_compression_level);
    }

    if (flags & H5Z_FLAG_REVERSE) {
        // Decompress.
        vbz_size_t out_size = vbz_decompressed_size(
            *buf, static_cast<vbz_size_t>(*buf_size), &options);
        if (vbz_is_error(out_size)) {
            std::fprintf(stderr, "vbz plugin: %s\n", vbz_error_string(out_size));
            return 0;
        }
        void* out = std::malloc(out_size ? out_size : 1);
        if (!out) return 0;
        vbz_size_t used = vbz_decompress_sized(
            *buf, static_cast<vbz_size_t>(*buf_size), out, out_size, &options);
        if (vbz_is_error(used) || used != out_size) {
            if (!vbz_is_error(used))
                std::fprintf(stderr, "vbz plugin: size mismatch on decode\n");
            else
                std::fprintf(stderr, "vbz plugin: %s\n", vbz_error_string(used));
            std::free(out);
            return 0;
        }
        std::free(*buf);
        *buf = out;
        *buf_size = out_size;
        return used;
    }

    // Compress.
    if (options.integer_size != 0 && *buf_size % options.integer_size != 0) {
        std::fprintf(stderr,
                     "vbz plugin: buffer not a multiple of integer size\n");
        return 0;
    }
    vbz_size_t bound = vbz_max_compressed_size(
        static_cast<vbz_size_t>(*buf_size), &options);
    if (vbz_is_error(bound)) {
        std::fprintf(stderr, "vbz plugin: %s\n", vbz_error_string(bound));
        return 0;
    }
    void* out = std::malloc(bound);
    if (!out) return 0;
    vbz_size_t used = vbz_compress_sized(
        *buf, static_cast<vbz_size_t>(*buf_size), out, bound, &options);
    if (vbz_is_error(used)) {
        std::fprintf(stderr, "vbz plugin: %s\n", vbz_error_string(used));
        std::free(out);
        return 0;
    }
    std::free(*buf);
    *buf = out;
    *buf_size = bound;
    return used;
}

const H5Z_class2_t kVbzFilterClass = {
    H5Z_CLASS_T_VERS,
    kVbzFilterId,
    1,  // encoder present
    1,  // decoder present
    "vbz",
    nullptr,  // can_apply
    nullptr,  // set_local
    vbz_h5_filter,
};

}  // namespace

extern "C" {

// Dynamic-load hooks looked up by libhdf5 (H5PLextern.h contract).
H5PL_type_t H5PLget_plugin_type(void) { return H5PL_TYPE_FILTER; }
const void* H5PLget_plugin_info(void) { return &kVbzFilterClass; }

}
