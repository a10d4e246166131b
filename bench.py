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
    # Best of 3 runs: resist transient CPU contention (a loaded machine
    # should not inflate the TPU/CPU ratio).
    best = 0.0
    for _ in range(3):
        out = subprocess.run([bench, "64", "0"], check=True,
                             capture_output=True, text=True).stdout
        d = json.loads(out)
        # Combined enc+dec throughput (bytes / total time).
        enc, dec = d["encode_gb_s"], d["decode_gb_s"]
        best = max(best, 2 * enc * dec / (enc + dec))
    return best


def tpu_codec_gbps() -> float:
    import jax

    # Remote compiles on the axon backend take minutes; persist them.
    cache_dir = os.path.join(REPO, ".jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from vbz_compression_tpu.ops import jax_svb

    # Measurement notes for this environment (axon tunnel to a remote chip):
    # - jax.block_until_ready returns early — useless for timing. The only
    #   reliable fence is pulling data to the host, which costs a ~0.1-0.35 s
    #   RPC round trip.
    # - Therefore: queue R independent calls asynchronously (the device
    #   executes FIFO), force only the LAST result, and take the slope
    #   between two values of R — RPC latency and dispatch overhead cancel.
    B, N = 4, 4 * 1024 * 1024  # 4 rows × 8 MiB of int16
    BLOCK = 65536   # compact kernels (codec5)
    SLACK = 2048  # compact-kernel extra-bytes budget per block
    sig = make_signal(B * N).reshape(B, N)

    # Preferred path: Pallas v5 kernels (alignment-split butterfly routing,
    # in-kernel MXU key pack/unpack, int8 data plane). Falls back to the
    # XLA gather-free formulation if they fail to compile on this backend.
    try:
        from vbz_compression_tpu.ops import pallas_codec5 as pc5

        # Compact variant: the routed array spans block+SLACK (not 2*block)
        # slots; overflowing blocks are flagged and the codec3 general
        # kernel takes over (signal workloads essentially never overflow).
        @jax.jit
        def enc_c(x):
            return pc5.encode_w2(x, block=BLOCK, flavor="zz16", slack=SLACK)

        @jax.jit
        def dec_c(keys, data):
            boffs = pc5.block_offsets_from_keys_flat(keys, BLOCK)
            return pc5.decode_w2(keys, data, boffs, block=BLOCK,
                                 flavor="zz16", slack=SLACK)

        @jax.jit
        def enc_g(x):
            return pc5.encode_w2_general(x, block=BLOCK)

        @jax.jit
        def dec_g(keys, data):
            boffs = pc5.block_offsets_from_keys_flat(keys, 16384)
            return pc5.decode_w2_general(keys, data, boffs, block=16384)

        x0 = jax.device_put(jnp.asarray(sig[0]))
        compact = int(enc_c(x0)[3][None][0]) == 0
        enc_p = enc_c if compact else enc_g
        dec_p = dec_c if compact else dec_g

        k0, d0 = enc_p(x0)[:2]
        o0 = dec_p(k0, d0)
        m = int(jnp.sum(jnp.abs(o0.astype(jnp.int32)
                                - x0.astype(jnp.int32)))[None][0])
        assert m == 0, f"pallas round-trip mismatch: {m}"

        xs = [jax.device_put(jnp.asarray(row)) for row in sig]
        encoded = [enc_p(row) for row in xs]
        enc_calls = [lambda row=row: enc_p(row)[1] for row in xs]
        dec_calls = [lambda k=e[0], d=e[1]: dec_p(k, d) for e in encoded]
        print(f"# path: pallas kernels ({'compact' if compact else 'general'})",
              file=sys.stderr)
        return _measure(enc_calls, dec_calls, N)
    except Exception as exc:  # pragma: no cover - backend-dependent
        print(f"# pallas path unavailable ({type(exc).__name__}); "
              f"falling back to XLA", file=sys.stderr)

    enc = jax.jit(lambda x, n: jax_svb.encode_chunk(x, n, 2, True))
    dec = jax.jit(lambda s, n, l: jax_svb.decode_chunk(s, n, l, 2, True, N))

    xs = [jax.device_put(jnp.asarray(row)) for row in sig]
    nb = jnp.int32(N)

    streams = []
    totals = []
    for row in xs:
        s, t = enc(row, nb)
        streams.append(s)
        totals.append(t)
    # Validate round-trip ON DEVICE (pulling 8 MiB arrays through the tunnel
    # takes minutes; pull only scalars).
    mismatch = jax.jit(
        lambda x, o, ok: jnp.where(ok, jnp.sum(jnp.abs(
            x.astype(jnp.int32) - o.astype(jnp.int32))), jnp.int32(-1)))
    for row_dev, s, t in zip(xs, streams, totals):
        o, ok = dec(s, nb, t)
        m = int(mismatch(row_dev, o, ok)[None][0])
        assert m == 0, f"round-trip mismatch on device: {m}"

    enc_calls = [lambda row=row: enc(row, nb)[0] for row in xs]
    dec_calls = [lambda s=s, t=t: dec(s, nb, t)[0]
                 for s, t in zip(streams, totals)]
    return _measure(enc_calls, dec_calls, N)


def _measure(enc_calls, dec_calls, n_values):
    import time

    import jax
    import jax.numpy as jnp

    def fence(arr):
        return float(jnp.sum(arr.astype(jnp.int32).ravel()[:8])[None][0])

    def run_passes(fn_calls, r):
        t0 = time.perf_counter()
        last = None
        for _ in range(r):
            for call in fn_calls:
                last = call()
        fence(last)
        return time.perf_counter() - t0

    # The fence RPC costs 0.1-0.35 s with high variance; make the measured
    # device time dominate it and take the median of several slopes.
    r_lo, r_hi = 4, 44
    run_passes(enc_calls, 1)  # warm fence path
    enc_samples = sorted(
        (run_passes(enc_calls, r_hi) - run_passes(enc_calls, r_lo)) / (
            (r_hi - r_lo) * len(enc_calls)) for _ in range(3))
    enc_s = enc_samples[1]
    run_passes(dec_calls, 1)
    dec_samples = sorted(
        (run_passes(dec_calls, r_hi) - run_passes(dec_calls, r_lo)) / (
            (r_hi - r_lo) * len(dec_calls)) for _ in range(3))
    dec_s = dec_samples[1]

    nbytes = n_values * 2  # per call
    enc_s = max(enc_s, 1e-9)
    dec_s = max(dec_s, 1e-9)

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
