"""A/B the full-pipeline (svb + zstd) wall-clock throughput.

Measures api.vbz_compress_sized_batch / vbz_decompress_sized_batch end to end
(host bytes -> host bytes) on the bench workload: 64 MiB of pseudo-signal in
8 MiB chunks, zstd level 1 — the configuration the reference's perf harness
times (vbz/perf/vbz_perf.cpp:145-171) and what the HDF5 plugin executes.

Usage: python tools/ab_pipeline.py [backend ...]
  backends: pallas (default), native, scalar
"""

import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def make_signal(total_values: int, seed: int = 42) -> np.ndarray:
    rng = np.random.default_rng(seed)
    steps = rng.normal(0, 12, total_values)
    sig = 500 + np.cumsum(steps)
    sig = np.clip(sig, -2000, 2000)
    return sig.astype(np.int16)


def _jax_cache():
    import jax

    cache_dir = os.path.join(REPO, ".jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def run(backend_name: str, chunks, opts, reps: int = 3):
    from vbz_compression_tpu import api

    if backend_name == "pallas":
        _jax_cache()
        from vbz_compression_tpu.models.codec import PallasSvbBackend
        backend = PallasSvbBackend()
    elif backend_name == "native":
        from vbz_compression_tpu import native_backend
        backend = native_backend.NativeBackend()
    else:
        from vbz_compression_tpu.ops import scalar
        backend = scalar

    total = sum(c.nbytes for c in chunks)
    # Warm (compile/cache) once.
    streams = api.vbz_compress_sized_batch(chunks, opts, backend=backend)
    t0 = time.perf_counter()
    for _ in range(reps):
        streams = api.vbz_compress_sized_batch(chunks, opts, backend=backend)
    enc_s = (time.perf_counter() - t0) / reps
    outs = api.vbz_decompress_sized_batch(streams, opts, backend=backend)
    t0 = time.perf_counter()
    for _ in range(reps):
        outs = api.vbz_decompress_sized_batch(streams, opts, backend=backend)
    dec_s = (time.perf_counter() - t0) / reps
    for c, o in zip(chunks, outs):
        assert c.tobytes() == o, "round-trip mismatch"
    csize = sum(len(s) for s in streams)
    print(f"{backend_name}: enc {total/enc_s/1e9:.3f} GB/s, "
          f"dec {total/dec_s/1e9:.3f} GB/s, ratio {csize/total:.4f}")


def main():
    from vbz_compression_tpu.options import CompressionOptions

    backends = sys.argv[1:] or ["pallas"]
    n_chunks, chunk_mb = 8, 8
    sig = make_signal(n_chunks * chunk_mb * (1 << 20) // 2)
    chunks = list(sig.reshape(n_chunks, -1))
    opts = CompressionOptions(perform_delta_zig_zag=True, integer_size=2,
                              zstd_compression_level=1, vbz_version=0)
    for b in backends:
        run(b, chunks, opts)


if __name__ == "__main__":
    main()
