// Fuzz harness for the native VBZ codec — counterpart of the reference's
// libFuzzer target (reference: vbz/fuzzing/vbz_fuzz.cpp:63-191).
//
// Per input, sweeps the 32-config option lattice:
//   zigzag {0,1} × integer_size {0,1,2,4} × zstd {0,1} × version {0,1}
// running (a) compress→decompress→byte-compare, sized and unsized, and
// (b) adversarial decompress of the raw input with doubling output-size
// probes up to 1 MiB.
//
// Build:  make fuzz         (clang libFuzzer + ASan/UBSan)
//         make fuzz_replay  (plain binary replaying corpus files / stdin)

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <vector>

#include "vbz_native.h"

namespace {

void roundtrip_case(const uint8_t* data, size_t size,
                    const CompressionOptions& opts) {
    if (opts.integer_size != 0 && size % opts.integer_size != 0) {
        size -= size % opts.integer_size;
    }
    vbz_size_t bound =
        vbz_max_compressed_size(static_cast<vbz_size_t>(size), &opts);
    if (vbz_is_error(bound)) return;
    std::vector<uint8_t> compressed(bound);
    vbz_size_t c = vbz_compress_sized(data, static_cast<vbz_size_t>(size),
                                      compressed.data(), bound, &opts);
    if (vbz_is_error(c)) return;
    std::vector<uint8_t> out(size ? size : 1);
    vbz_size_t d = vbz_decompress_sized(compressed.data(), c, out.data(),
                                        static_cast<vbz_size_t>(size), &opts);
    if (vbz_is_error(d) || d != size ||
        std::memcmp(out.data(), data, size) != 0) {
        std::fprintf(stderr, "ROUNDTRIP MISMATCH zz=%d sz=%u z=%u v=%u\n",
                     opts.perform_delta_zig_zag, opts.integer_size,
                     opts.zstd_compression_level, opts.vbz_version);
        __builtin_trap();
    }
}

void adversarial_case(const uint8_t* data, size_t size,
                      const CompressionOptions& opts) {
    // Treat input as a compressed stream; probe plausible output sizes.
    for (vbz_size_t probe = 4; probe <= (1u << 20); probe *= 2) {
        std::vector<uint8_t> out(probe);
        (void)vbz_decompress(data, static_cast<vbz_size_t>(size), out.data(),
                             probe, &opts);
        std::vector<uint8_t> out2(probe);
        (void)vbz_decompress_sized(data, static_cast<vbz_size_t>(size),
                                   out2.data(), probe, &opts);
    }
}

void run_all(const uint8_t* data, size_t size) {
    const unsigned sizes[] = {0, 1, 2, 4};
    for (int zz = 0; zz < 2; ++zz)
        for (unsigned is : sizes)
            for (unsigned zl = 0; zl < 2; ++zl)
                for (unsigned v = 0; v < 2; ++v) {
                    CompressionOptions o{zz != 0, is, zl, v};
                    roundtrip_case(data, size, o);
                    adversarial_case(data, size, o);
                }
}

}  // namespace

extern "C" int LLVMFuzzerTestOneInput(const uint8_t* data, size_t size) {
    run_all(data, size);
    return 0;
}

#if defined(VBZ_FUZZ_REPLAY)
int main(int argc, char** argv) {
    if (argc < 2) {
        std::fprintf(stderr, "usage: %s corpus_file...\n", argv[0]);
        return 2;
    }
    for (int i = 1; i < argc; ++i) {
        FILE* f = std::fopen(argv[i], "rb");
        if (!f) continue;
        std::fseek(f, 0, SEEK_END);
        long n = std::ftell(f);
        std::fseek(f, 0, SEEK_SET);
        std::vector<uint8_t> buf(n > 0 ? static_cast<size_t>(n) : 0);
        if (n > 0 && std::fread(buf.data(), 1, buf.size(), f) != buf.size()) {
            std::fclose(f);
            continue;
        }
        std::fclose(f);
        run_all(buf.data(), buf.size());
    }
    std::puts("corpus replay ok");
    return 0;
}
#endif
