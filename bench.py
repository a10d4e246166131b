"""Benchmark: TPU codec throughput on the int16 signal hot path.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "GB/s", "vs_baseline": N}

- value: combined encode+decode device throughput (GB/s of uncompressed
  int16 signal processed per second on one chip), measured device-resident
  (inputs live on device; only the jitted codec steps are timed).
- vs_baseline: ratio vs the reference-equivalent single-core CPU codec
  (our native C++ scalar implementation of the reference pipeline,
  StreamVByte stage only, zstd level 0 — matching what the TPU stage does).

The workload mirrors the reference perf harness (vbz/perf/vbz_perf.cpp +
test_data_generator.h): pseudo-signal reads, int16, zig-zag, v0.
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)


def make_signal(total_values: int, seed: int = 42) -> np.ndarray:
    rng = np.random.default_rng(seed)
    steps = rng.normal(0, 12, total_values)
    sig = 500 + np.cumsum(steps)
    sig = np.clip(sig, -2000, 2000)
    return sig.astype(np.int16)


def cpu_baseline_gbps() -> float:
    """Single-core native codec throughput (svb stage, no zstd), GB/s."""
    bench = os.path.join(REPO, "native", "vbz_bench")
    if not os.path.exists(bench):
        subprocess.run(["make", "-C", os.path.join(REPO, "native"), "-s"],
                       check=True)
    out = subprocess.run([bench, "64", "0"], check=True,
                         capture_output=True, text=True).stdout
    d = json.loads(out)
    # Combined enc+dec throughput: harmonic-mean style (bytes / total time).
    enc, dec = d["encode_gb_s"], d["decode_gb_s"]
    return 2 * enc * dec / (enc + dec)


def tpu_codec_gbps() -> float:
    import jax

    # Remote compiles on the axon backend take minutes; persist them.
    cache_dir = os.path.join(REPO, ".jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from vbz_compression_tpu.ops import jax_svb

    B, N = 32, 131072  # 8 MiB of int16 per step
    sig = make_signal(B * N).reshape(B, N)
    lens = np.full(B, N, dtype=np.int32)

    enc = jax.jit(lambda x, n: jax_svb.encode_batch(x, n, 2, True))
    dec = jax.jit(
        lambda s, n, l: jax_svb.decode_batch_n(s, n, l, 2, True, N))

    xb = jax.device_put(jnp.asarray(sig))
    nb = jax.device_put(jnp.asarray(lens))

    streams, totals = enc(xb, nb)
    jax.block_until_ready((streams, totals))
    out, ok = dec(streams, nb, totals)
    jax.block_until_ready((out, ok))
    assert bool(np.asarray(ok).all()), "decode validation failed"
    np.testing.assert_array_equal(np.asarray(out), sig)

    nbytes = sig.size * 2
    reps = 5
    t0 = time.perf_counter()
    for _ in range(reps):
        streams, totals = enc(xb, nb)
    jax.block_until_ready((streams, totals))
    enc_s = (time.perf_counter() - t0) / reps

    t0 = time.perf_counter()
    for _ in range(reps):
        out, ok = dec(streams, nb, totals)
    jax.block_until_ready((out, ok))
    dec_s = (time.perf_counter() - t0) / reps

    enc_gbps = nbytes / enc_s / 1e9
    dec_gbps = nbytes / dec_s / 1e9
    print(f"# encode {enc_gbps:.3f} GB/s, decode {dec_gbps:.3f} GB/s",
          file=sys.stderr)
    return 2 * enc_gbps * dec_gbps / (enc_gbps + dec_gbps)


def main() -> None:
    baseline = cpu_baseline_gbps()
    value = tpu_codec_gbps()
    print(json.dumps({
        "metric": "int16_signal_codec_encdec_throughput",
        "value": round(value, 4),
        "unit": "GB/s",
        "vs_baseline": round(value / baseline, 3),
    }))


if __name__ == "__main__":
    main()
