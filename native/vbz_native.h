// C ABI of the native VBZ runtime codec — mirrors the reference library's
// public interface (reference: vbz/vbz.h:29-141) so existing pyvbz/cffi
// consumers can link against this implementation unchanged.
#pragma once

#include <stdint.h>
#include <stdbool.h>

#if defined(__cplusplus)
extern "C" {
#endif

#define VBZ_DEFAULT_VERSION 0

typedef uint32_t vbz_size_t;

#define VBZ_ZSTD_ERROR ((vbz_size_t)-1)
#define VBZ_INPUT_SIZE_ERROR ((vbz_size_t)-2)
#define VBZ_INTEGER_SIZE_ERROR ((vbz_size_t)-3)
#define VBZ_DESTINATION_SIZE_ERROR ((vbz_size_t)-4)
#define VBZ_STREAMVBYTE_STREAM_ERROR ((vbz_size_t)-5)
#define VBZ_VERSION_ERROR ((vbz_size_t)-6)
#define VBZ_OUT_OF_MEMORY_ERROR ((vbz_size_t)-7)
#define VBZ_FIRST_ERROR VBZ_OUT_OF_MEMORY_ERROR

struct CompressionOptions {
    bool perform_delta_zig_zag;
    unsigned int integer_size;          // 0, 1, 2 or 4
    unsigned int zstd_compression_level; // 0 disables zstd
    unsigned int vbz_version;           // 0 or 1
};

#if defined(__cplusplus)
typedef CompressionOptions CompressionOptionsT;
#else
typedef struct CompressionOptions CompressionOptions;
#endif

bool vbz_is_error(vbz_size_t result_value);
const char* vbz_error_string(vbz_size_t error_value);

vbz_size_t vbz_max_compressed_size(vbz_size_t source_size,
                                   const CompressionOptions* options);

vbz_size_t vbz_compress(const void* source, vbz_size_t source_size,
                        void* destination, vbz_size_t destination_capacity,
                        const CompressionOptions* options);

vbz_size_t vbz_decompress(const void* source, vbz_size_t source_size,
                          void* destination, vbz_size_t destination_size,
                          const CompressionOptions* options);

vbz_size_t vbz_compress_sized(const void* source, vbz_size_t source_size,
                              void* destination,
                              vbz_size_t destination_capacity,
                              const CompressionOptions* options);

vbz_size_t vbz_decompress_sized(const void* source, vbz_size_t source_size,
                                void* destination,
                                vbz_size_t destination_capacity,
                                const CompressionOptions* options);

vbz_size_t vbz_decompressed_size(const void* source, vbz_size_t source_size,
                                 const CompressionOptions* options);

#if defined(__cplusplus)
}
#endif
