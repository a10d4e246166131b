// Stand-in for lemire/streamvbyte's zigzag helper header (see
// streamvbyte.h in this directory for why). Used by the reference's generic
// workers (vbz/v0/vbz_streamvbyte_impl.h:34,77); the int16+zigzag headline
// path uses the reference's in-tree SSSE3 code instead.
#pragma once

#include <stddef.h>
#include <stdint.h>

#ifdef __cplusplus
extern "C" {
#endif

void zigzag_delta_encode(const int32_t* in, uint32_t* out, size_t count,
                         int32_t prev);
void zigzag_delta_decode(const uint32_t* in, int32_t* out, size_t count,
                         int32_t prev);

#ifdef __cplusplus
}
#endif
