// SIMD fast path for the int16 + delta-zigzag StreamVByte stage (the fast5
// signal hot path). Independent design, NOT a port of the reference's SSSE3
// worker (vbz/v0/vbz_streamvbyte_impl_sse3.h): that code widens every
// delta to 32 bits and drives the generic 4-byte shuffle LUTs; here we
// exploit that 16-bit wraparound zigzag deltas are always <= 0xFFFF, so
// codes are only ever 0 (1 byte) or 1 (2 bytes) and one 16-entry-per-mask
// byte-compaction LUT handles 8 values per shuffle:
//
//   encode: load 8 int16 -> wrap deltas -> zigzag -> mask = (v > 255)
//           -> one pshufb compacts [l0 h0 .. l7 h7] to the wire bytes
//           -> 2 key bytes from a 256-entry mask->u16 LUT.
//   decode: mask from 2 key bytes -> one pshufb expands the packed bytes
//           back to 8 u16 -> unzigzag -> 16-bit prefix sum (3 shifted adds
//           + carry broadcast) -> store.
//
// Streams with codes 2/3 (produced for int16 by *non*-wraparound encoders,
// e.g. the reference's non-SSE generic worker) drop that 8-value group to
// the scalar path; everything this library or the reference's SSE path
// emits stays on the fast loop.
//
// Compiled only when __SSSE3__ is available; callers gate on
// vbz_simd16z_usable() (runtime no-op here since build == run host, but it
// keeps the plugin honest if the .so travels).
#pragma once

#include <cstdint>
#include <cstring>

#if defined(__SSSE3__)
#include <immintrin.h>
#define VBZ_SIMD16Z 1

namespace vbz_simd {

// ---- tables (built once, thread-safe via static init) ---------------------

struct Tables {
    // enc_shuf[m]: compact [l0 h0 .. l7 h7] -> l0 (h0?) l1 (h1?) ...
    alignas(16) uint8_t enc_shuf[256][16];
    // dec_shuf[m]: expand packed wire bytes -> [l0 h0|0 .. l7 h7|0]
    alignas(16) uint8_t dec_shuf[256][16];
    uint16_t key_of_mask[256];   // 2-bit codes (0/1) packed little-endian
    uint8_t mask_of_key[256];    // inverse for one key byte (4 values)
    uint8_t key_ok[256];         // all four 2-bit codes <= 1 ?
    Tables() {
        for (int m = 0; m < 256; ++m) {
            int out = 0;
            for (int i = 0; i < 8; ++i) {
                enc_shuf[m][out++] = static_cast<uint8_t>(2 * i);      // low
                if (m & (1 << i))
                    enc_shuf[m][out++] = static_cast<uint8_t>(2 * i + 1);
            }
            for (; out < 16; ++out) enc_shuf[m][out] = 0x80;
            int pos = 0;
            for (int i = 0; i < 8; ++i) {
                dec_shuf[m][2 * i] = static_cast<uint8_t>(pos++);
                dec_shuf[m][2 * i + 1] =
                    (m & (1 << i)) ? static_cast<uint8_t>(pos++) : 0x80;
            }
            uint16_t key = 0;
            for (int i = 0; i < 8; ++i)
                if (m & (1 << i)) key |= static_cast<uint16_t>(1u << (2 * i));
            key_of_mask[m] = key;
            uint8_t inv = 0;
            bool ok = true;
            for (int i = 0; i < 4; ++i) {
                unsigned code = (m >> (2 * i)) & 3u;
                if (code > 1) ok = false;
                if (code & 1) inv |= static_cast<uint8_t>(1u << i);
            }
            mask_of_key[m] = inv;
            key_ok[m] = ok;
        }
    }
};

inline const Tables& tables() {
    static const Tables t;
    return t;
}

inline bool usable() {
#if defined(__GNUC__) && !defined(__clang__)
    return __builtin_cpu_supports("ssse3");
#else
    return true;
#endif
}

// Collapse _mm_movemask_epi8's 2-bits-per-u16-lane result (bits 2i and
// 2i+1 equal) to one bit per lane, without BMI2.
inline unsigned _pext_like(unsigned m16) {
    // take bit 2i -> bit i for i in 0..7
    unsigned r = 0;
    r |= (m16 >> 0) & 0x01; r |= (m16 >> 1) & 0x02;
    r |= (m16 >> 2) & 0x04; r |= (m16 >> 3) & 0x08;
    r |= (m16 >> 4) & 0x10; r |= (m16 >> 5) & 0x20;
    r |= (m16 >> 6) & 0x40; r |= (m16 >> 7) & 0x80;
    return r;
}

// ---- encode ---------------------------------------------------------------

// Fused int16 -> wrap-delta -> zigzag -> svb encode of `count` values.
// Returns wire bytes written, or 0 if the caller must use the scalar path
// (capacity too tight for the 16-byte store slack).
inline uint32_t encode_16z(const uint8_t* src, uint32_t count, uint8_t* dst,
                           uint32_t capacity, uint32_t key_len) {
    const Tables& t = tables();
    uint8_t* keys = dst;
    uint8_t* data = dst + key_len;
    uint8_t* const end = dst + capacity;

    uint32_t i = 0;
    __m128i prev = _mm_setzero_si128();  // [0,0,0,0,0,0,0, prev_last]
    const __m128i zero = _mm_setzero_si128();
    // Main loop: 16 values per iteration (two 8-lane groups). The r3
    // profile showed the 8-per-iteration loop ran at half the reference
    // codec's rate; unrolling 2x halves the loop/bookkeeping overhead, the
    // two groups' mask computations overlap in the OOO window, and the two
    // u16 key writes merge into one u32 store. Keys are written (not OR'd)
    // here, so the up-front whole-key-region memset — a second pass over
    // count/4 bytes — is gone; only the tail's key bytes get zeroed below.
    // 32 bytes of slack: the second 16-byte store lands at data + adv0,
    // adv0 <= 16.
    for (; i + 16 <= count && data + 32 <= end; i += 16) {
        __m128i cur0 = _mm_loadu_si128(
            reinterpret_cast<const __m128i*>(src + 2 * i));
        __m128i cur1 = _mm_loadu_si128(
            reinterpret_cast<const __m128i*>(src + 2 * i + 16));
        // prev values: [last_prev, cur0..cur6]
        __m128i shifted0 = _mm_alignr_epi8(cur0, prev, 14);
        __m128i shifted1 = _mm_alignr_epi8(cur1, cur0, 14);
        __m128i delta0 = _mm_sub_epi16(cur0, shifted0);
        __m128i delta1 = _mm_sub_epi16(cur1, shifted1);
        prev = cur1;
        // zigzag16: (d << 1) ^ (d >> 15)
        __m128i zz0 = _mm_xor_si128(_mm_slli_epi16(delta0, 1),
                                    _mm_srai_epi16(delta0, 15));
        __m128i zz1 = _mm_xor_si128(_mm_slli_epi16(delta1, 1),
                                    _mm_srai_epi16(delta1, 15));
        // mask bit i = value i needs a high byte (v > 255): compare the
        // high byte per lane, saturating-pack the two groups' 0/FFFF lanes
        // to 0/FF bytes in ONE register, movemask -> one bit per value.
        __m128i hi_z0 = _mm_cmpeq_epi16(_mm_srli_epi16(zz0, 8), zero);
        __m128i hi_z1 = _mm_cmpeq_epi16(_mm_srli_epi16(zz1, 8), zero);
        unsigned mask16 = (~static_cast<unsigned>(_mm_movemask_epi8(
            _mm_packs_epi16(hi_z0, hi_z1)))) & 0xFFFFu;
        unsigned mask0 = mask16 & 0xFFu, mask1 = mask16 >> 8;
        __m128i packed0 = _mm_shuffle_epi8(
            zz0, _mm_load_si128(
                reinterpret_cast<const __m128i*>(t.enc_shuf[mask0])));
        __m128i packed1 = _mm_shuffle_epi8(
            zz1, _mm_load_si128(
                reinterpret_cast<const __m128i*>(t.enc_shuf[mask1])));
        _mm_storeu_si128(reinterpret_cast<__m128i*>(data), packed0);
        uint32_t adv0 = 8 + __builtin_popcount(mask0);
        _mm_storeu_si128(reinterpret_cast<__m128i*>(data + adv0), packed1);
        data += adv0 + 8 + __builtin_popcount(mask1);
        uint32_t key = t.key_of_mask[mask0] |
                       (static_cast<uint32_t>(t.key_of_mask[mask1]) << 16);
        std::memcpy(keys + (i >> 2), &key, 4);
    }
    // 8-value cleanup (same scheme, one group).
    for (; i + 8 <= count && data + 16 <= end; i += 8) {
        __m128i cur = _mm_loadu_si128(
            reinterpret_cast<const __m128i*>(src + 2 * i));
        __m128i shifted = _mm_alignr_epi8(cur, prev, 14);
        __m128i delta = _mm_sub_epi16(cur, shifted);
        prev = cur;
        __m128i zz = _mm_xor_si128(_mm_slli_epi16(delta, 1),
                                   _mm_srai_epi16(delta, 15));
        __m128i hi_z = _mm_cmpeq_epi16(_mm_srli_epi16(zz, 8), zero);
        unsigned mask = (~static_cast<unsigned>(_mm_movemask_epi8(
            _mm_packs_epi16(hi_z, hi_z)))) & 0xFFu;
        __m128i packed = _mm_shuffle_epi8(
            zz, _mm_load_si128(
                reinterpret_cast<const __m128i*>(t.enc_shuf[mask])));
        _mm_storeu_si128(reinterpret_cast<__m128i*>(data), packed);
        data += 8 + __builtin_popcount(mask);
        uint16_t key = t.key_of_mask[mask];
        std::memcpy(keys + (i >> 2), &key, 2);
    }
    // The vector loops exit with i % 8 == 0 and every key byte below i/4
    // written; zero only the tail's key bytes (the scalar loop ORs).
    std::memset(keys + (i >> 2), 0, key_len - (i >> 2));
    // Scalar tail (and tight-capacity fallback).
    uint16_t sprev = i ? reinterpret_cast<const uint16_t*>(src)[i - 1] : 0;
    for (; i < count; ++i) {
        uint16_t cur;
        std::memcpy(&cur, src + 2 * i, 2);
        uint16_t delta = static_cast<uint16_t>(cur - sprev);
        sprev = cur;
        int16_t sd;
        std::memcpy(&sd, &delta, 2);
        uint16_t v = static_cast<uint16_t>((delta << 1) ^
                                           static_cast<uint16_t>(sd >> 15));
        unsigned code = v > 0xFFu;
        if (data + code + 1 > end) return 0;  // caller retries scalar
        keys[i >> 2] |= static_cast<uint8_t>(code << ((i & 3) * 2));
        *data++ = static_cast<uint8_t>(v);
        if (code) *data++ = static_cast<uint8_t>(v >> 8);
    }
    return static_cast<uint32_t>(data - dst);
}

// ---- decode ---------------------------------------------------------------

// Fused svb decode -> unzigzag -> 16-bit wraparound prefix sum for `count`
// values. Returns bytes consumed from `src` (keys included), or UINT32_MAX
// on stream error. Writes 2*count bytes to dst.
inline uint32_t decode_16z(const uint8_t* src, uint32_t src_size,
                           uint8_t* dst, uint32_t count) {
    const Tables& t = tables();
    uint32_t key_len = (count + 3) / 4;
    if (key_len > src_size) return UINT32_MAX;
    const uint8_t* keys = src;
    const uint8_t* data = src + key_len;
    const uint8_t* const end = src + src_size;

    uint32_t i = 0;
    __m128i carry = _mm_setzero_si128();  // acc broadcast in every lane
    for (; i + 8 <= count && data + 16 <= end; i += 8) {
        uint8_t k0 = keys[i >> 2], k1 = keys[(i >> 2) + 1];
        if (!(t.key_ok[k0] & t.key_ok[k1])) break;  // codes 2/3: scalar
        unsigned mask = t.mask_of_key[k0] |
                        (unsigned(t.mask_of_key[k1]) << 4);
        __m128i packed = _mm_loadu_si128(
            reinterpret_cast<const __m128i*>(data));
        __m128i zz = _mm_shuffle_epi8(
            packed, _mm_load_si128(
                reinterpret_cast<const __m128i*>(t.dec_shuf[mask])));
        data += 8 + __builtin_popcount(mask);
        // unzigzag16: (v >> 1) ^ -(v & 1)
        __m128i ones = _mm_and_si128(zz, _mm_set1_epi16(1));
        __m128i neg = _mm_sub_epi16(_mm_setzero_si128(), ones);
        __m128i delta = _mm_xor_si128(_mm_srli_epi16(zz, 1), neg);
        // inclusive 16-bit prefix sum across the 8 lanes
        delta = _mm_add_epi16(delta, _mm_slli_si128(delta, 2));
        delta = _mm_add_epi16(delta, _mm_slli_si128(delta, 4));
        delta = _mm_add_epi16(delta, _mm_slli_si128(delta, 8));
        __m128i acc = _mm_add_epi16(delta, carry);
        _mm_storeu_si128(reinterpret_cast<__m128i*>(dst + 2 * i), acc);
        carry = _mm_shuffle_epi8(
            acc, _mm_set1_epi16(0x0F0E));  // broadcast last lane
    }
    // Scalar remainder (tail, tight data, or foreign 2/3-coded groups).
    uint16_t acc16;
    {
        alignas(16) uint16_t lanes[8];
        _mm_store_si128(reinterpret_cast<__m128i*>(lanes), carry);
        acc16 = lanes[7];
    }
    for (; i < count; ++i) {
        unsigned code = (keys[i >> 2] >> ((i & 3) * 2)) & 3u;
        if (data + code + 1 > end) return UINT32_MAX;
        uint32_t v = 0;
        for (unsigned b = 0; b <= code; ++b)
            v |= static_cast<uint32_t>(*data++) << (8 * b);
        // Truncate-first un-zigzag (the scalar values_to_output semantics;
        // also what codes 2/3 from foreign encoders get).
        uint16_t v16 = static_cast<uint16_t>(v);
        uint16_t delta = static_cast<uint16_t>(
            (v16 >> 1) ^ static_cast<uint16_t>(-(v16 & 1u)));
        acc16 = static_cast<uint16_t>(acc16 + delta);
        std::memcpy(dst + 2 * i, &acc16, 2);
    }
    if (data != end) return UINT32_MAX;
    return static_cast<uint32_t>(data - src);
}

}  // namespace vbz_simd

#else
#define VBZ_SIMD16Z 0
#endif  // __SSSE3__
