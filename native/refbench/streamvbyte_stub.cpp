// Scalar implementations of the lemire/streamvbyte entry points the
// reference links against (the vendored submodule is absent here; see
// streamvbyte.h). Wire format: 2-bit length codes packed 4-per-key-byte
// (code c => c+1 data bytes, little-endian low bytes of the u32), key block
// first, data stream after — the same format our own oracle implements
// (vbz_compression_tpu/ops/scalar.py).
//
// These are only reached by the reference's generic (non-SSSE3) workers;
// the benchmarked int16+zigzag path never calls them.

#include "streamvbyte.h"
#include "streamvbyte_zigzag.h"

#include <cstring>

extern "C" {

size_t streamvbyte_max_compressedbytes(uint32_t count) {
    // key bytes + worst-case 4 data bytes per value.
    return ((count + 3) / 4) + 4 * (size_t)count;
}

size_t streamvbyte_encode(const uint32_t* in, uint32_t count, uint8_t* out) {
    uint8_t* keys = out;
    uint8_t* data = out + (count + 3) / 4;
    uint8_t key = 0;
    for (uint32_t i = 0; i < count; ++i) {
        uint32_t v = in[i];
        uint8_t code = (v > 0xFF) + (v > 0xFFFF) + (v > 0xFFFFFF);
        key |= (uint8_t)(code << ((i & 3) * 2));
        std::memcpy(data, &v, 4);
        data += code + 1;
        if ((i & 3) == 3) {
            *keys++ = key;
            key = 0;
        }
    }
    if (count & 3) *keys = key;
    return (size_t)(data - out);
}

size_t streamvbyte_decode(const uint8_t* in, uint32_t* out, uint32_t count) {
    const uint8_t* keys = in;
    const uint8_t* data = in + (count + 3) / 4;
    for (uint32_t i = 0; i < count; ++i) {
        uint8_t code = (uint8_t)((keys[i >> 2] >> ((i & 3) * 2)) & 3);
        uint32_t v;
        std::memcpy(&v, data, 4);  // relies on STREAMVBYTE_PADDING
        v &= 0xFFFFFFFFu >> (8 * (3 - code));
        out[i] = v;
        data += code + 1;
    }
    return (size_t)(data - in);
}

int streamvbyte_validate_stream(const uint8_t* in, size_t in_bytes,
                                uint32_t out_count) {
    size_t key_len = (out_count + 3) / 4;
    if (in_bytes < key_len) return 0;
    size_t data_len = 0;
    for (uint32_t i = 0; i < out_count; ++i) {
        data_len += ((in[i >> 2] >> ((i & 3) * 2)) & 3) + 1;
    }
    // Trailing key bits beyond out_count must be zero.
    if (out_count & 3) {
        if (in[key_len - 1] >> ((out_count & 3) * 2)) return 0;
    }
    return key_len + data_len == in_bytes;
}

void zigzag_delta_encode(const int32_t* in, uint32_t* out, size_t count,
                         int32_t prev) {
    for (size_t i = 0; i < count; ++i) {
        int32_t d = (int32_t)((uint32_t)in[i] - (uint32_t)prev);
        out[i] = ((uint32_t)d << 1) ^ (uint32_t)(d >> 31);
        prev = in[i];
    }
}

void zigzag_delta_decode(const uint32_t* in, int32_t* out, size_t count,
                         int32_t prev) {
    for (size_t i = 0; i < count; ++i) {
        uint32_t z = in[i];
        int32_t d = (int32_t)((z >> 1) ^ (~(z & 1) + 1));
        prev = (int32_t)((uint32_t)prev + (uint32_t)d);
        out[i] = prev;
    }
}

}  // extern "C"
