// ThreadSanitizer smoke: the Python batch API (api.vbz_compress_sized_batch)
// drives vbz_compress/vbz_decompress from a thread pool (ctypes releases the
// GIL), so the codec must be data-race-free under concurrent per-chunk use.
// This mirrors that pattern natively: N threads round-trip independent
// buffers through the full pipeline (svb + zstd) concurrently.
//
// Build/run: make -C native tsan  (counterpart of the reference's
// SANITIZE_THREAD option, cmake/FindTSan.cmake).

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <thread>
#include <vector>

#include "vbz_native.h"

namespace {

bool worker(unsigned seed) {
    const uint32_t count = 100000;
    std::vector<int16_t> src(count);
    uint32_t state = seed * 2654435761u + 1;
    int16_t value = 0;
    for (uint32_t i = 0; i < count; ++i) {
        state = state * 1664525u + 1013904223u;
        value = static_cast<int16_t>(value + static_cast<int>(state % 25) - 12);
        src[i] = value;
    }
    CompressionOptions opts{true, 2, 1, 0};
    vbz_size_t src_size = count * 2;
    vbz_size_t bound = vbz_max_compressed_size(src_size, &opts);
    std::vector<uint8_t> comp(bound);
    vbz_size_t n = vbz_compress_sized(src.data(), src_size, comp.data(),
                                      bound, &opts);
    if (vbz_is_error(n)) return false;
    std::vector<int16_t> out(count);
    vbz_size_t r = vbz_decompress_sized(comp.data(), n, out.data(), src_size,
                                        &opts);
    if (vbz_is_error(r) || r != src_size) return false;
    return std::memcmp(src.data(), out.data(), src_size) == 0;
}

}  // namespace

int main() {
    const int n_threads = 8, reps = 4;
    std::vector<std::thread> threads;
    std::vector<int> ok(n_threads, 0);
    for (int t = 0; t < n_threads; ++t) {
        threads.emplace_back([t, &ok] {
            bool good = true;
            for (int r = 0; r < reps; ++r)
                good = good && worker(static_cast<unsigned>(t * 101 + r));
            ok[t] = good ? 1 : 0;
        });
    }
    for (auto& th : threads) th.join();
    for (int t = 0; t < n_threads; ++t) {
        if (!ok[t]) {
            std::fprintf(stderr, "thread %d round-trip failed\n", t);
            return 1;
        }
    }
    std::puts("vbz_tsan_smoke: all threads round-tripped");
    return 0;
}
