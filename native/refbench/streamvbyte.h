// Minimal stand-in for lemire/streamvbyte's public header, which the
// reference vendors as a git submodule that is not checked out in this
// environment (/root/reference/third_party/streamvbyte is empty; the build
// fetches it via ExternalProject, CMakeLists.txt:177-193).
//
// Only the declarations the reference's codec sources use are provided
// (vbz/v0/vbz_streamvbyte_impl.h:5,25,49,59 and vbz/v0/vbz_streamvbyte.cpp:17).
// The implementations in streamvbyte_stub.cpp are scalar: they only run on
// the reference's *generic* worker paths (int8/int32, and int16 without
// zigzag). The benchmark's headline path — int16 + delta-zigzag — never
// touches them: it uses the reference's own self-contained SSSE3
// specialization (vbz/v0/vbz_streamvbyte_impl_sse3.h:403-660).
#pragma once

#include <stddef.h>
#include <stdint.h>

#ifdef __cplusplus
extern "C" {
#endif

// Padding the decoder may read (but not use) past the end of input.
#define STREAMVBYTE_PADDING 16

size_t streamvbyte_encode(const uint32_t* in, uint32_t count, uint8_t* out);
size_t streamvbyte_decode(const uint8_t* in, uint32_t* out, uint32_t count);
int streamvbyte_validate_stream(const uint8_t* in, size_t in_bytes,
                                uint32_t out_count);
size_t streamvbyte_max_compressedbytes(uint32_t count);

#ifdef __cplusplus
}
#endif
