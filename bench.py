"""Benchmark: TPU codec throughput on the int16 signal hot path.

Prints JSON lines (the LAST is the headline metric the driver parses):

  {"metric": "int16_signal_pipeline_encdec_throughput", ...}   # svb+zstd1
  {"metric": "int16_signal_codec_encdec_throughput", ...}      # svb stage

- value: combined (harmonic-mean) encode+decode throughput, GB/s of
  uncompressed int16 signal per second on one chip. The svb-stage line is
  measured device-resident (only the jitted codec steps are timed); the
  pipeline line is host-to-host wall clock through the public batch API
  (device svb stage + threaded host zstd), i.e. what a plugin/CLI user gets.
- vs_baseline: ratio vs the REFERENCE's own codec compiled from
  /root/reference/vbz at -O3 -mssse3 (the SSSE3 hot path that ships in
  fast5, vbz/v0/vbz_streamvbyte_impl_sse3.h) and timed on this host over
  the identical workload (native/refbench/ref_bench.cpp). The svb line
  compares against the reference svb stage (zstd level 0); the pipeline
  line against reference vbz_compress_sized at zstd level 1.

The workload mirrors the reference perf harness (vbz/perf/vbz_perf.cpp +
test_data_generator.h): pseudo-signal READS, int16, zig-zag, v0 — read
boundaries leave 3-15 two-byte deltas per 64K block, so this headline
exercises the gated replay path on every block. NOTE: rounds 1-2 benched a
boundary-free walk (e_sum = 0 per block), which corresponds to this
bench's "pure" tier — compare BENCH_r02's value against pure_gb_s, not
the headline. Mixed (sigma=50, ~1% two-byte deltas) and pure tiers are
reported as extra fields on the headline line so content dependence is
captured in BENCH_r*.json, not just README prose.
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)


def _ensure_tool(name: str) -> str:
    path = os.path.join(REPO, "native", name)
    if not os.path.exists(path):
        subprocess.run(["make", "-C", os.path.join(REPO, "native"),
                        "-s", name], check=True)
    return path


def workload(tag: str, mb: int, sigma: float, lo: int, hi: int,
             seed: int) -> str:
    """Generate (once) a shared pseudo-signal file via native/gen_signal so
    the TPU bench, the CPU baselines and the reference binary all time the
    byte-identical stream. Returns the file path."""
    path = f"/tmp/vbz_bench_{tag}_{mb}mb_{sigma}_{seed}.bin"
    if not (os.path.exists(path) and os.path.getsize(path) == mb << 20):
        subprocess.run([_ensure_tool("gen_signal"), path, str(mb),
                        str(sigma), str(lo), str(hi), str(seed)], check=True)
    return path


def load_signal(path: str) -> np.ndarray:
    return np.fromfile(path, dtype=np.int16)


# clean: nanopore-like sigma=12 walk on [0, 2000] built from pseudo-READS
# (mirroring the reference perf harness) — read boundaries leave 3-15
# two-byte deltas per 64K block, so the sparse replay runs on almost every
# block: the REALISTIC tier. mixed: sigma=50 on +-30000 — ~1% of deltas
# need a second byte (dense-ladder replay). pure (generated in-process):
# a boundary-free walk, e_sum == 0 — the whole-block fast path's ceiling.
# hard (in-process): uniform random int16 — fully incompressible, every
# row overflows the compact budget and rides the general kernels.
CLEAN_ARGS = ("clean", 32, 12, 0, 2000, 42)
MIXED_ARGS = ("mixed", 32, 50, -30000, 30000, 7)


def pure_signal(b: int, n: int):
    rng = np.random.default_rng(11)
    return np.clip(500 + np.cumsum(rng.normal(0, 12, (b, n)), axis=1),
                   -2000, 2000).astype(np.int16)


def reference_baseline() -> dict:
    """The reference's own SSSE3 codec, best of 3 runs (resists transient
    CPU contention; a loaded machine should not inflate the TPU/CPU ratio)."""
    bench = _ensure_tool("ref_bench")
    clean = workload(*CLEAN_ARGS)
    best = {}
    for _ in range(3):
        out = subprocess.run([bench, str(CLEAN_ARGS[1]), clean], check=True,
                             capture_output=True, text=True).stdout
        d = json.loads(out)
        for k, v in d.items():
            best[k] = max(best.get(k, 0.0), v) if "gb_s" in k else v
    return best


def _hm(enc: float, dec: float) -> float:
    return 2 * enc * dec / (enc + dec)


def _jax_setup():
    import jax

    # Remote compiles on the axon backend take minutes; persist them.
    cache_dir = os.path.join(REPO, ".jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return jax


def tpu_codec_gbps() -> dict:
    """Device-resident svb-stage throughput: clean-signal tier (headline)
    + mixed-content tier, round-trip asserted on device for EVERY row."""
    jax = _jax_setup()
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
    sig = load_signal(workload(*CLEAN_ARGS)).reshape(B, N)
    mixed = load_signal(workload(*MIXED_ARGS)).reshape(B, N)
    pure = pure_signal(B, N)

    # Preferred path: Pallas v5 kernels (alignment-split butterfly routing,
    # in-kernel MXU key pack/unpack, int8 data plane). Falls back to the
    # XLA gather-free formulation if they fail to compile on this backend.
    try:
        from vbz_compression_tpu.ops import pallas_codec5 as pc5

        # Compact variant: the routed array spans block+SLACK (not 2*block)
        # slots; overflowing blocks are flagged and the codec5 general
        # kernel takes over (signal workloads essentially never overflow).
        # The batch rides the FLAT (B*N/128, 128) layout end to end — the
        # production bulk path (one batched-grid kernel program per call;
        # [B, N]-shaped device arrays force 2-3x XLA relayouts, the
        # round-3 "batched encode gap", tools/ab_rows_encode.py).
        @jax.jit
        def enc_r(x2):
            return pc5.encode_w2_rows_flat(x2, B, block=BLOCK,
                                           flavor="zz16", slack=SLACK)

        @jax.jit
        def dec_r(keys2, data):
            return pc5.decode_w2_rows_flat(keys2, data, B, block=BLOCK,
                                           flavor="zz16", slack=SLACK)

        # Overflow (dense-regime) tiers ride the round-5 dense leftward
        # network: byte tokens compact LEFT by the code-0 count, depth
        # log2(c0_sum), block 65536 single-channel — on-chip A/B vs the
        # block-16384 general kernel on incompressible content: enc
        # 20.8 vs 14.1, dec 10.6 vs 8.0 GB/s (tools/ab_dense.py).
        from vbz_compression_tpu.ops import pallas_dense as pcd

        BLOCK_G = 65536

        @jax.jit
        def enc_g(x2):
            return pcd.encode_w2_dense_rows_flat(x2, B, block=BLOCK_G)

        @jax.jit
        def dec_g(keys2, data):
            return pcd.decode_w2_dense_rows_flat(keys2, data, B,
                                                 block=BLOCK_G)

        @jax.jit
        def mismatch(x, o):
            return jnp.sum(jnp.abs(o.astype(jnp.int32) - x.astype(jnp.int32)))

        hard = np.random.default_rng(13).integers(
            -32768, 32767, (B, N), dtype=np.int16)
        tier_calls = {}
        for tier, rows in (("clean", sig), ("mixed", mixed),
                           ("pure", pure), ("hard", hard)):
            x2 = jax.device_put(jnp.asarray(
                rows.reshape(B * N // 128, 128)))
            k2, d, _lens, ovf = enc_r(x2)
            compact = int(jnp.sum(ovf)[None][0]) == 0

            if compact:
                # Round-trip asserted ON DEVICE (scalar pull only).
                m = int(mismatch(x2, dec_r(k2, d))[None][0])
                assert m == 0, f"pallas round-trip mismatch ({tier}): {m}"
                enc_calls = [lambda x2=x2: enc_r(x2)[1]]
                dec_calls = [lambda k2=k2, d=d: dec_r(k2, d)]
                n_per_call = B * N
            else:
                # Dense-regime fallback: BATCHED leftward-network kernels
                # (one kernel program for the batch, like the compact
                # path; batched dense enc measured +40% over per-row).
                kg2, dg, _lg = enc_g(x2)
                m = int(mismatch(x2, dec_g(kg2, dg))[None][0])
                assert m == 0, f"round-trip mismatch ({tier}): {m}"
                enc_calls = [lambda x2=x2: enc_g(x2)[1]]
                dec_calls = [lambda kg2=kg2, dg=dg: dec_g(kg2, dg)]
                n_per_call = B * N
            print(f"# {tier}: pallas kernels "
                  f"({'compact batched' if compact else 'dense'})",
                  file=sys.stderr)
            tier_calls[tier] = (enc_calls, dec_calls, n_per_call, compact)

        # Best-of-3 interleaved passes over the tiers: the chip is
        # multi-tenant with ~3x swings between hour-scale windows, so a
        # single sequential pass can sample one tier in a bad window and
        # another in a good one (VERDICT r4: the official BENCH twice
        # under-reported within-run results). Per-pass samples ship in
        # the JSON so the artifact documents its own variance.
        tiers = {t: {"enc_samples": [], "dec_samples": [],
                     "compact": tier_calls[t][3]} for t in tier_calls}
        for _pass in range(3):
            for tier, (ec, dc, n, _c) in tier_calls.items():
                e, dgb = _measure(ec, dc, n, nsamp=3)
                tiers[tier]["enc_samples"].append(round(e, 3))
                tiers[tier]["dec_samples"].append(round(dgb, 3))
        for tier, rec in tiers.items():
            enc_gbps = max(rec["enc_samples"])
            dec_gbps = max(rec["dec_samples"])
            rec["enc"] = enc_gbps
            rec["dec"] = dec_gbps
            rec["combined"] = _hm(enc_gbps, dec_gbps)
            print(f"# {tier}: enc {enc_gbps:.3f} / dec {dec_gbps:.3f} GB/s "
                  f"(best of {rec['enc_samples']} / {rec['dec_samples']})",
                  file=sys.stderr)

        # Speed-of-light accounting (BASELINE.md's own yardstick; the
        # reference counts bytes/s per config, vbz_perf.cpp:45-46): measure
        # what a Pallas block copy achieves on THIS chip window, divide by
        # each kernel's HBM traffic per input byte, and report every tier
        # as a fraction of that bandwidth-bound ceiling.
        from vbz_compression_tpu.utils import roofline

        copy_bw = roofline.measure_copy_gbps()
        f_compact = roofline.w2_traffic_factor(BLOCK, SLACK)
        f_general = roofline.w2_traffic_factor(BLOCK_G, BLOCK_G)
        for tier, d in tiers.items():
            factor = f_compact if d.pop("compact") else f_general
            sol = copy_bw / factor
            d["pct_of_roofline_enc"] = 100 * d["enc"] / sol
            d["pct_of_roofline_dec"] = 100 * d["dec"] / sol
        tiers["_roofline"] = {
            "hbm_copy_gb_s": copy_bw,
            "hbm_peak_gb_s": roofline.HBM_PEAK_GB_S,
            "traffic_per_input_byte_compact": f_compact,
            "sol_gb_s_compact": copy_bw / f_compact,
        }
        print(f"# roofline: copy {copy_bw:.0f} GB/s, compact SoL "
              f"{copy_bw / f_compact:.0f} GB/s per direction",
              file=sys.stderr)
        return tiers
    except Exception as exc:  # pragma: no cover - backend-dependent
        print(f"# pallas path unavailable ({type(exc).__name__}: {exc}); "
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
    enc_gbps, dec_gbps = _measure(enc_calls, dec_calls, N)
    return {"clean": {"enc": enc_gbps, "dec": dec_gbps,
                      "combined": _hm(enc_gbps, dec_gbps)}}


def pipeline_gbps(encoder: str | None = None, reps: int = 5,
                  dec_reps: int | None = None) -> dict:
    """Full-pipeline (svb + zstd level 1) wall clock through the public
    batch API — host bytes to host bytes, native backend + threaded zstd.

    This is what the HDF5 plugin / CLI deliver. The TPU svb stage is NOT
    used here: on the axon tunnel every per-chunk pull costs a ~0.1-0.35 s
    RPC (measured end-to-end 0.02 GB/s — tools/ab_pipeline.py), which is a
    property of this environment's link, not of the codec; the
    device-resident svb line below is the TPU number.

    ``encoder`` selects the zstd stage ("own-tpu" = from-scratch RFC 8878
    encoder with the TPU match scan) via the VBZ_ZSTD_ENCODER env var the
    batch API's threaded zstd stage reads."""
    from vbz_compression_tpu import api, native_backend
    from vbz_compression_tpu.options import CompressionOptions

    backend = native_backend.NativeSvbBackend()

    n_chunks = 4  # 4 × 8 MiB (the shared 32 MiB clean workload)
    sig = load_signal(workload(*CLEAN_ARGS))
    chunks = list(sig.reshape(n_chunks, -1))
    total = sig.nbytes
    opts = CompressionOptions(perform_delta_zig_zag=True, integer_size=2,
                              zstd_compression_level=1, vbz_version=0)

    prev_env = os.environ.get("VBZ_ZSTD_ENCODER")
    if encoder is not None:
        os.environ["VBZ_ZSTD_ENCODER"] = encoder
    try:
        # Best-of-reps, like the reference baseline's best-of-3: this host
        # has 2 cores and transient contention swings identical calls by
        # >10x; an average would bias the comparison against whichever
        # side ran in the bad window.
        streams = api.vbz_compress_sized_batch(chunks, opts, backend=backend)
        enc_s = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            streams = api.vbz_compress_sized_batch(chunks, opts,
                                                   backend=backend)
            enc_s = min(enc_s, time.perf_counter() - t0)
        outs = api.vbz_decompress_sized_batch(streams, opts, backend=backend)
        dec_s = float("inf")
        # The decode leg is stock libzstd regardless of ``encoder``; reps=1
        # under-sampled it 6x between rounds (VERDICT r4) — always take
        # best-of->=3 on decode even when the (slow) encode leg runs once.
        for _ in range(dec_reps if dec_reps is not None else max(reps, 3)):
            t0 = time.perf_counter()
            outs = api.vbz_decompress_sized_batch(streams, opts,
                                                  backend=backend)
            dec_s = min(dec_s, time.perf_counter() - t0)
    finally:
        if encoder is not None:
            if prev_env is None:
                os.environ.pop("VBZ_ZSTD_ENCODER", None)
            else:
                os.environ["VBZ_ZSTD_ENCODER"] = prev_env
    for c, o in zip(chunks, outs):
        assert c.tobytes() == o, "pipeline round-trip mismatch"
    enc_gbps, dec_gbps = total / enc_s / 1e9, total / dec_s / 1e9
    nout = sum(map(len, streams))
    print(f"# pipeline[{encoder or 'libzstd'}] encode {enc_gbps:.3f} GB/s, "
          f"decode {dec_gbps:.3f} GB/s, ratio {nout / total:.4f}",
          file=sys.stderr)
    return {"enc": enc_gbps, "dec": dec_gbps,
            "combined": _hm(enc_gbps, dec_gbps), "bytes": nout}


def _measure(enc_calls, dec_calls, n_values, nsamp=5):
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
    # device time dominate it (the rep delta is sized from a pilot run so
    # the differenced device time is ~0.6 s regardless of kernel speed —
    # a fixed delta under-resolves fast kernels: the batched pure-tier
    # encode at >100 GB/s produced non-positive slopes at delta 22), keep
    # r_lo large enough that fence noise appears (and cancels) in BOTH
    # runs of each difference, reject non-positive slopes, and take the
    # SECOND-best of 5: the chip is multi-tenant and a bad window
    # depresses every sample it touches, but a lone lucky slope (fence
    # noise landing in the r_lo run) can be absurdly fast — one observed
    # sample read 1 TB/s — so the single best is not trustworthy either.
    def slope_per_call(fn_calls):
        run_passes(fn_calls, 1)  # warm fence path
        pilot = (run_passes(fn_calls, 24) - run_passes(fn_calls, 4)) / 20
        pilot = max(pilot, 5e-5)
        dr = int(min(max(0.6 / pilot, 22), 3000))
        r_lo = 22
        samples = []
        for _ in range(12):
            s = (run_passes(fn_calls, r_lo + dr)
                 - run_passes(fn_calls, r_lo)) / dr
            if s > 0:
                samples.append(s)
            if len(samples) >= nsamp:
                break
        assert len(samples) >= 2, "chip window too noisy for a slope"
        return sorted(samples)[1] / len(fn_calls)

    enc_s = slope_per_call(enc_calls)
    dec_s = slope_per_call(dec_calls)

    nbytes = n_values * 2  # per call
    enc_s = max(enc_s, 1e-9)
    dec_s = max(dec_s, 1e-9)

    enc_gbps = nbytes / enc_s / 1e9
    dec_gbps = nbytes / dec_s / 1e9
    print(f"# encode {enc_gbps:.3f} GB/s, decode {dec_gbps:.3f} GB/s",
          file=sys.stderr)
    return enc_gbps, dec_gbps


def main() -> None:
    ref = reference_baseline()
    ref_svb = _hm(ref["svb_encode_gb_s"], ref["svb_decode_gb_s"])
    ref_pipe = _hm(ref["pipe_encode_gb_s"], ref["pipe_decode_gb_s"])
    print(f"# reference SSSE3 baseline: svb enc {ref['svb_encode_gb_s']:.3f}"
          f" / dec {ref['svb_decode_gb_s']:.3f} (combined {ref_svb:.3f}); "
          f"pipeline enc {ref['pipe_encode_gb_s']:.3f} / dec "
          f"{ref['pipe_decode_gb_s']:.3f} (combined {ref_pipe:.3f}) GB/s",
          file=sys.stderr)

    pipe = pipeline_gbps()
    print(json.dumps({
        "metric": "int16_signal_pipeline_encdec_throughput",
        "value": round(pipe["combined"], 4),
        "unit": "GB/s",
        "vs_baseline": round(pipe["combined"] / ref_pipe, 3),
        "encode_gb_s": round(pipe["enc"], 4),
        "decode_gb_s": round(pipe["dec"], 4),
        "baseline_gb_s": round(ref_pipe, 4),
    }))

    # From-scratch entropy coder, end to end: the RFC 8878 encoder
    # replacing libzstd in the same pipeline. Host matcher — the TPU match
    # scan (own-tpu) produces the same frames but pulls a 4-byte-per-byte
    # match map through the 0.1-0.35 s/RPC tunnel, an environment cost,
    # not a codec one. Since round 5 the whole frame encoder is native
    # (vbz_own_zstd.cpp, byte-identical to the NumPy oracle) and fast
    # enough for best-of-3 sampling on both legs.
    try:
        own = pipeline_gbps(encoder="own", reps=3)
        print(json.dumps({
            "metric": "int16_signal_pipeline_own_encoder",
            "value": round(own["combined"], 4),
            "unit": "GB/s",
            "vs_baseline": round(own["combined"] / ref_pipe, 3),
            "encode_gb_s": round(own["enc"], 4),
            "decode_gb_s": round(own["dec"], 4),
            "size_vs_libzstd": round(own["bytes"] / pipe["bytes"], 4),
        }))
    except Exception as exc:  # pragma: no cover - keep the headline alive
        print(f"# own-encoder line failed: {exc}", file=sys.stderr)

    tiers = tpu_codec_gbps()
    roof = tiers.pop("_roofline", None)
    clean = tiers["clean"]
    line = {
        "metric": "int16_signal_codec_encdec_throughput",
        "value": round(clean["combined"], 4),
        "unit": "GB/s",
        "vs_baseline": round(clean["combined"] / ref_svb, 3),
        "encode_gb_s": round(clean["enc"], 4),
        "decode_gb_s": round(clean["dec"], 4),
        "baseline_gb_s": round(ref_svb, 4),
    }
    for extra in ("mixed", "pure", "hard"):
        if extra in tiers:
            line[f"{extra}_gb_s"] = round(tiers[extra]["combined"], 4)
            line[f"{extra}_encode_gb_s"] = round(tiers[extra]["enc"], 4)
            line[f"{extra}_decode_gb_s"] = round(tiers[extra]["dec"], 4)
    # Per-pass samples (best-of-3 interleaved passes): the artifact shows
    # its own window variance instead of being one opaque sample.
    for t, d in tiers.items():
        if "enc_samples" in d:
            line[f"{t}_enc_samples"] = d["enc_samples"]
            line[f"{t}_dec_samples"] = d["dec_samples"]
    if roof is not None:
        line["hbm_copy_gb_s"] = round(roof["hbm_copy_gb_s"], 1)
        line["hbm_peak_gb_s"] = roof["hbm_peak_gb_s"]
        line["sol_gb_s"] = round(roof["sol_gb_s_compact"], 1)
        for tier, d in tiers.items():
            if "pct_of_roofline_enc" in d:
                line[f"{tier}_pct_of_roofline_enc"] = round(
                    d["pct_of_roofline_enc"], 2)
                line[f"{tier}_pct_of_roofline_dec"] = round(
                    d["pct_of_roofline_dec"], 2)
    print(json.dumps(line))


if __name__ == "__main__":
    main()
