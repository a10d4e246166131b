"""Chip throughput for every non-hot codec flavor — the counterpart of the
reference perf harness's i8/i16/i32 x zstd sweep (reference
vbz/perf/vbz_perf.cpp:145-171). bench.py's tiers measure zz16 only; this
gate measures the remaining (integer_size x zigzag) kernels on their
PRODUCTION device backends (the same routing models/codec.py uses):

  zz8           pallas_codec5 rows_flat (W2, int8 data plane)
  zz32/none32/
  none16/none8  pallas_w4 deletion-compaction kernels (block 16384;
                codec3 W4 remains the sub-16K-chunk fallback)

Writes FLAVORS_r05.json: per-flavor encode/decode GB/s (slope method) and
an on-device round-trip assert. Run on the real chip (no JAX_PLATFORMS).
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np  # noqa: E402
import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402

from vbz_compression_tpu.ops import pallas_codec3 as pc3  # noqa: E402
from vbz_compression_tpu.ops import pallas_codec5 as pc5  # noqa: E402

B = 4
N_W2 = 2 * 1024 * 1024   # values per row for the W2 (codec5) flavors
N_W4 = 1024 * 1024       # values per row for the W4 (codec3) flavors
SLACK = 2048


def fence(arr):
    return float(jnp.sum(arr.astype(jnp.int32).ravel()[:8])[None][0])


def measure(calls, nbytes):
    def run(r):
        t0 = time.perf_counter()
        last = None
        for _ in range(r):
            for c in calls:
                last = c()
        fence(last)
        return time.perf_counter() - t0

    r_lo, r_hi = 4, 24
    run(1)
    samples = []
    for _ in range(8):
        s = (run(r_hi) - run(r_lo)) / ((r_hi - r_lo) * len(calls))
        if s > 0:
            samples.append(s)
        if len(samples) >= 4:
            break
    assert len(samples) >= 2, "chip too noisy"
    return nbytes / sorted(samples)[1] / 1e9


def content(flavor):
    rng = np.random.default_rng(5)
    if flavor == "zz8":
        return np.clip(np.cumsum(rng.normal(0, 3, (B, N_W2))),
                       -100, 100).astype(np.int8)
    if flavor == "zz32":
        return np.cumsum(
            rng.integers(-2000, 2000, (B, N_W4)), axis=1).astype(np.int32)
    if flavor == "none16":
        return np.clip(500 + np.cumsum(rng.normal(0, 12, (B, N_W4)),
                                       axis=1), 0, 2000).astype(np.int16)
    if flavor == "none8":
        return rng.integers(0, 120, (B, N_W4), dtype=np.int8)
    if flavor == "none32":
        return rng.integers(0, 1 << 20, (B, N_W4), dtype=np.int32)
    raise ValueError(flavor)


def main():
    out = {"device": str(jax.devices()[0]),
           "note": ("production backends per flavor; GB/s of uncompressed "
                    "input per direction, slope method, one chip")}

    @jax.jit
    def mismatch(x, o):
        return jnp.sum(jnp.abs(o.astype(jnp.int32) - x.astype(jnp.int32)))

    # --- zz8: codec5 rows_flat (the W2 int8 plane) ---
    sig = content("zz8")
    isz = 1

    @jax.jit
    def enc8(x2):
        return pc5.encode_w2_rows_flat(x2, B, block=16384, flavor="zz8",
                                       slack=SLACK)

    @jax.jit
    def dec8(k2, d):
        return pc5.decode_w2_rows_flat(k2, d, B, block=16384, flavor="zz8",
                                       slack=SLACK)

    x2 = jax.device_put(jnp.asarray(sig.reshape(B * N_W2 // 128, 128)))
    k2, d, _lens, ovf = enc8(x2)
    assert int(jnp.sum(ovf)[None][0]) == 0
    m = int(mismatch(x2, dec8(k2, d))[None][0])
    assert m == 0, f"zz8 round-trip {m}"
    nbytes = B * N_W2 * isz
    out["zz8_encode_gb_s"] = round(measure([lambda: enc8(x2)[1]], nbytes), 2)
    out["zz8_decode_gb_s"] = round(measure([lambda: dec8(k2, d)], nbytes), 2)
    print(f"zz8: enc {out['zz8_encode_gb_s']} / dec {out['zz8_decode_gb_s']}"
          " GB/s", flush=True)

    # --- W4 flavors: the r5 deletion-compaction kernels (production) ---
    from vbz_compression_tpu.ops import pallas_w4 as pw4

    for flavor in ("zz32", "none32", "none16", "none8"):
        sig = content(flavor)
        isz = sig.dtype.itemsize

        @jax.jit
        def enc(x, flavor=flavor):
            return pw4.encode_w4_dense(x, block=16384, flavor=flavor)

        @jax.jit
        def dec(keys, data, boffs, flavor=flavor):
            return pw4.decode_w4_dense(keys, data, boffs, block=16384,
                                       flavor=flavor)

        @jax.jit
        def offs(keys):
            return pw4.byte_offsets_from_keys_w4(keys, 16384)

        xs = [jax.device_put(jnp.asarray(row)) for row in sig]
        encoded = []
        for x in xs:
            k, dd, _t = enc(x)
            bo = offs(k)
            m = int(mismatch(x, dec(k, dd, bo))[None][0])
            assert m == 0, f"{flavor} round-trip {m}"
            encoded.append((k, dd, bo))
        nbytes = sig.shape[1] * isz
        e = measure([lambda x=x: enc(x)[1] for x in xs], nbytes)
        dgb = measure([lambda k=k, dd=dd, bo=bo: dec(k, dd, bo)
                       for k, dd, bo in encoded], nbytes)
        out[f"{flavor}_encode_gb_s"] = round(e, 2)
        out[f"{flavor}_decode_gb_s"] = round(dgb, 2)
        print(f"{flavor}: enc {e:.2f} / dec {dgb:.2f} GB/s", flush=True)

    # --- v1 half-byte (int8): the round-5 deletion-compaction kernels ---
    from vbz_compression_tpu.ops import pallas_v1 as pv1

    sigv1 = np.clip(np.cumsum(
        np.random.default_rng(6).normal(0, 3, (B, N_W4)), axis=1),
        -100, 100).astype(np.int8)

    @jax.jit
    def encv1(x):
        return pv1.encode_v1(x, block=16384, flavor="zz8")

    @jax.jit
    def decv1(k, d, noffs):
        return pv1.decode_v1(k, d, noffs, block=16384, flavor="zz8")

    @jax.jit
    def offsv1(k):
        return pv1.nib_offsets_from_keys(k, 16384)

    xs = [jax.device_put(jnp.asarray(row)) for row in sigv1]
    encoded = []
    for x in xs:
        k, d, _t = encv1(x)
        no = offsv1(k)
        m = int(mismatch(x, decv1(k, d, no))[None][0])
        assert m == 0, f"v1 round-trip {m}"
        encoded.append((k, d, no))
    nbytes = N_W4
    out["v1_zz8_encode_gb_s"] = round(
        measure([lambda x=x: encv1(x)[1] for x in xs], nbytes), 2)
    out["v1_zz8_decode_gb_s"] = round(
        measure([lambda k=k, d=d, no=no: decv1(k, d, no)
                 for k, d, no in encoded], nbytes), 2)
    print(f"v1_zz8: enc {out['v1_zz8_encode_gb_s']} / "
          f"dec {out['v1_zz8_decode_gb_s']} GB/s", flush=True)

    path = os.path.join(REPO, "FLAVORS_r05.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
