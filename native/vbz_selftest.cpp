// Native unit tests — the framework's counterpart of the reference's
// Catch2 suites (reference: vbz/test/vbz_test.cpp, streamvbyte_test.cpp).
// Golden byte vectors are lifted from the same reference test cases so the
// native codec is pinned to the shipped wire format:
//   - int16 zigzag v0 golden bytes     (streamvbyte_test.cpp:207-212)
//   - uint16 no-zigzag golden bytes    (streamvbyte_test.cpp:225-237)
//   - int32 zigzag core API bytes      (vbz_test.cpp:176-209)
//   - sized framing header {20,0,0,0}  (vbz_test.cpp:290-350)
//   - round-trip property sweeps       (vbz_test.cpp:46-142)
// Build & run: make -C native selftest

#include "vbz_native.h"

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <random>
#include <vector>

static int g_failures = 0;

#define CHECK(cond)                                                     \
    do {                                                                \
        if (!(cond)) {                                                  \
            std::fprintf(stderr, "FAIL %s:%d: %s\n", __FILE__, __LINE__, \
                         #cond);                                        \
            ++g_failures;                                               \
        }                                                               \
    } while (0)

static std::vector<uint8_t> compress_bytes(const void* src, vbz_size_t n,
                                           const CompressionOptions& o) {
    std::vector<uint8_t> out(vbz_max_compressed_size(n, &o));
    vbz_size_t used = vbz_compress(src, n, out.data(),
                                   (vbz_size_t)out.size(), &o);
    CHECK(!vbz_is_error(used));
    out.resize(used);
    return out;
}

static void test_golden_int16_zigzag_v0() {
    const int16_t values[] = {0, -1, 4, -9, 16, -25, 36, -49, 64, -81, 100};
    const int8_t expected[] = {0, 0, 20, 0, 1, 10, 25, 50, 81, 122, -87,
                               -30, 33, 1, 106, 1};
    CompressionOptions o{true, 2, 0, 0};
    auto out = compress_bytes(values, sizeof values, o);
    CHECK(out.size() == sizeof expected);
    CHECK(std::memcmp(out.data(), expected, sizeof expected) == 0);

    int16_t back[11] = {};
    vbz_size_t n = vbz_decompress(out.data(), (vbz_size_t)out.size(), back,
                                  sizeof back, &o);
    CHECK(n == sizeof back);
    CHECK(std::memcmp(back, values, sizeof values) == 0);

    // v1 for int16 delegates to v0 (reference v1/vbz_streamvbyte.cpp:46-61)
    CompressionOptions o1{true, 2, 0, 1};
    auto out1 = compress_bytes(values, sizeof values, o1);
    CHECK(out1 == out);
}

static void test_golden_uint16_no_zigzag() {
    const uint16_t values[] = {0, 1, 4, 9, 16, 25, 36, 49, 64, 81, 100};
    const uint8_t expected[] = {0, 0, 0, 0, 1, 4, 9, 16, 25, 36, 49,
                                64, 81, 100};
    for (unsigned version = 0; version <= 1; ++version) {
        CompressionOptions o{false, 2, 0, version};
        auto out = compress_bytes(values, sizeof values, o);
        CHECK(out.size() == sizeof expected);
        CHECK(std::memcmp(out.data(), expected, sizeof expected) == 0);
    }
}

static void test_golden_int32_zigzag_core() {
    const int32_t values[] = {5, 4, 3, 2, 1};
    const uint8_t expected[] = {0, 0, 10, 1, 1, 1, 1};
    CompressionOptions o{true, 4, 0, 0};
    auto out = compress_bytes(values, sizeof values, o);
    CHECK(out.size() == sizeof expected);
    CHECK(std::memcmp(out.data(), expected, sizeof expected) == 0);
}

static void test_golden_sized_framing() {
    const int32_t values[] = {5, 4, 3, 2, 1};
    const uint8_t expected[] = {20, 0, 0, 0, 0, 0, 10, 1, 1, 1, 1};
    CompressionOptions o{true, 4, 0, 0};
    std::vector<uint8_t> out(vbz_max_compressed_size(sizeof values, &o) + 4);
    vbz_size_t used = vbz_compress_sized(values, sizeof values, out.data(),
                                         (vbz_size_t)out.size(), &o);
    CHECK(used == sizeof expected);
    CHECK(std::memcmp(out.data(), expected, sizeof expected) == 0);
    CHECK(vbz_decompressed_size(out.data(), used, &o) == 20);

    int32_t back[5] = {};
    vbz_size_t n = vbz_decompress_sized(out.data(), used, back, sizeof back,
                                        &o);
    CHECK(n == sizeof back);
    CHECK(std::memcmp(back, values, sizeof values) == 0);
}

template <typename T>
static void roundtrip_sweep(bool zigzag, unsigned zstd_level,
                            unsigned version, std::mt19937& rng) {
    std::vector<T> values(10000);
    std::uniform_int_distribution<int64_t> dist(
        (int64_t)std::numeric_limits<T>::min(),
        (int64_t)std::numeric_limits<T>::max());
    for (auto& v : values) v = (T)dist(rng);

    CompressionOptions o{zigzag, (unsigned)sizeof(T), zstd_level, version};
    vbz_size_t nbytes = (vbz_size_t)(values.size() * sizeof(T));
    auto out = compress_bytes(values.data(), nbytes, o);
    std::vector<T> back(values.size());
    vbz_size_t n = vbz_decompress(out.data(), (vbz_size_t)out.size(),
                                  back.data(), nbytes, &o);
    CHECK(n == nbytes);
    CHECK(back == values);
}

static void test_roundtrip_sweeps() {
    std::mt19937 rng(42);
    for (unsigned version = 0; version <= 1; ++version)
        for (unsigned level : {0u, 1u})
            for (bool zz : {false, true}) {
                roundtrip_sweep<int8_t>(zz, level, version, rng);
                roundtrip_sweep<int16_t>(zz, level, version, rng);
                roundtrip_sweep<int32_t>(zz, level, version, rng);
            }
}

static void test_error_taxonomy() {
    CompressionOptions bad{true, 3, 0, 0};
    uint8_t buf[64] = {};
    CHECK(vbz_compress(buf, 8, buf, sizeof buf, &bad)
          == VBZ_INTEGER_SIZE_ERROR);
    CompressionOptions badver{true, 2, 0, 7};
    CHECK(vbz_compress(buf, 8, buf, sizeof buf, &badver)
          == VBZ_VERSION_ERROR);
    CompressionOptions o{true, 2, 0, 0};
    CHECK(vbz_compress(buf, 7, buf, sizeof buf, &o)  // 7 % 2 != 0
          == VBZ_INPUT_SIZE_ERROR);
    CHECK(vbz_is_error(VBZ_ZSTD_ERROR));
    CHECK(!vbz_is_error(123));
    CHECK(std::strlen(vbz_error_string(VBZ_STREAMVBYTE_STREAM_ERROR)) > 0);
}

extern "C" int64_t vbz_own_zstd_frame(const uint8_t* src, int64_t n,
                                      uint8_t* dst, int64_t cap);
#include <zstd.h>

// The from-scratch zstd frame encoder (vbz_own_zstd.cpp) must emit frames
// the stock libzstd decoder round-trips, across content classes that hit
// every block type (RLE / raw / Huffman-literals / sequences).
static void test_own_zstd_frames() {
    std::mt19937 rng(7);
    std::vector<std::vector<uint8_t>> cases;
    cases.push_back({});                                  // empty frame
    cases.push_back(std::vector<uint8_t>(5000, 42));      // RLE block
    {
        std::vector<uint8_t> v(300000);                   // multi-block rand
        for (auto& b : v) b = (uint8_t)rng();
        cases.push_back(v);
    }
    {
        std::vector<uint8_t> v;                           // matchy content
        for (int i = 0; i < 20000; ++i) v.push_back("abcabcd"[i % 7]);
        cases.push_back(v);
    }
    {
        std::vector<uint8_t> v(150000);                   // signal-like
        int x = 500;
        for (auto& b : v) {
            x += (int)(rng() % 7) - 3;
            b = (uint8_t)(x & 0xFF);
        }
        cases.push_back(v);
    }
    for (const auto& in : cases) {
        std::vector<uint8_t> frame(in.size() + in.size() / 8 + 256);
        int64_t m = vbz_own_zstd_frame(in.data(), (int64_t)in.size(),
                                       frame.data(), (int64_t)frame.size());
        CHECK(m > 0);
        if (m <= 0) continue;
        std::vector<uint8_t> back(in.size() + 16);
        size_t r = ZSTD_decompress(back.data(), back.size(), frame.data(),
                                   (size_t)m);
        CHECK(!ZSTD_isError(r));
        CHECK(r == in.size());
        CHECK(std::memcmp(back.data(), in.data(), in.size()) == 0);
    }
}

int main() {
    test_golden_int16_zigzag_v0();
    test_golden_uint16_no_zigzag();
    test_golden_int32_zigzag_core();
    test_golden_sized_framing();
    test_roundtrip_sweeps();
    test_error_taxonomy();
    test_own_zstd_frames();
    if (g_failures) {
        std::fprintf(stderr, "%d failures\n", g_failures);
        return 1;
    }
    std::puts("vbz_selftest: all tests passed");
    return 0;
}
