"""A/B: pallas_codec3 compact vs pallas_codec4 (alignment-split) on chip."""

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np
import jax

cache_dir = os.path.join(REPO, ".jax_cache")
os.makedirs(cache_dir, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

from vbz_compression_tpu.ops import pallas_codec3 as pc3
from vbz_compression_tpu.ops import pallas_codec4 as pc4
from vbz_compression_tpu.ops import pallas_codec5 as pc5

B, N = 4, 4 * 1024 * 1024
BLOCK = 32768
SLACK = 2048


def make_signal(total_values, seed=42):
    rng = np.random.default_rng(seed)
    steps = rng.normal(0, 12, total_values)
    sig = 500 + np.cumsum(steps)
    return np.clip(sig, -2000, 2000).astype(np.int16)


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

    r_lo, r_hi = 4, 44
    run(1)
    s = sorted((run(r_hi) - run(r_lo)) / ((r_hi - r_lo) * len(calls))
               for _ in range(3))[1]
    return nbytes / s / 1e9


def main():
    sig = make_signal(B * N).reshape(B, N)
    xs = [jax.device_put(jnp.asarray(r)) for r in sig]

    @jax.jit
    def enc3(x):
        return pc3.encode_w2(x, block=BLOCK, flavor="zz16", slack=SLACK)

    @jax.jit
    def dec3(keys, data):
        boffs = pc3.block_offsets_from_keys(keys, BLOCK)
        return pc3.decode_w2(keys, data, boffs, block=BLOCK,
                             flavor="zz16", slack=SLACK)

    @jax.jit
    def enc4(x):
        return pc4.encode_w2(x, block=BLOCK, flavor="zz16", slack=SLACK)

    @jax.jit
    def dec4(keys, data):
        boffs = pc4.block_offsets_from_keys_flat(keys, BLOCK)
        return pc4.decode_w2(keys, data, boffs, block=BLOCK,
                             flavor="zz16", slack=SLACK)

    # correctness on chip first: v4 vs v3 outputs + round trip
    k3, d3, t3, o3 = enc3(xs[0])
    k4, d4, t4, o4 = enc4(xs[0])
    t3v, t4v = int(t3[None][0]), int(t4[None][0])
    assert t3v == t4v, (t3v, t4v)
    kmism = int(jnp.sum((k3 != k4).astype(jnp.int32))[None][0])
    assert kmism == 0, f"keys mismatch: {kmism}"
    mism = int(jnp.sum((d3[:t3v] != d4[:t4v]).astype(jnp.int32))[None][0])
    print(f"# enc outputs match: {mism == 0} (total {t4v})", file=sys.stderr)
    assert mism == 0
    o = dec4(k4, d4)
    m = int(jnp.sum(jnp.abs(o.astype(jnp.int32)
                            - xs[0].astype(jnp.int32)))[None][0])
    assert m == 0, f"v4 round-trip mismatch {m}"
    print("# v4 round-trip ok on chip", file=sys.stderr)

    @jax.jit
    def enc5(x):
        return pc5.encode_w2(x, block=BLOCK, flavor="zz16", slack=SLACK)

    @jax.jit
    def dec5(keys, data):
        boffs = pc5.block_offsets_from_keys_flat(keys, BLOCK)
        return pc5.decode_w2(keys, data, boffs, block=BLOCK,
                             flavor="zz16", slack=SLACK)

    k5, d5, t5, o5 = enc5(xs[0])
    t5v = int(t5[None][0])
    assert t5v == t4v, (t5v, t4v)
    mism5 = int(jnp.sum((d4[:t4v].astype(jnp.int32) & 0xFF)
                        != (d5[:t5v].astype(jnp.int32) & 0xFF))[None][0])
    assert mism5 == 0, f"v5 data mismatch: {mism5}"
    o5r = dec5(k5, d5)
    m5 = int(jnp.sum(jnp.abs(o5r.astype(jnp.int32)
                             - xs[0].astype(jnp.int32)))[None][0])
    assert m5 == 0, f"v5 round-trip mismatch {m5}"
    print("# v5 bit-exact + round-trip ok on chip", file=sys.stderr)

    nbytes = N * 2
    enc3_calls = [lambda x=x: enc3(x)[1] for x in xs]
    enc4_calls = [lambda x=x: enc4(x)[1] for x in xs]
    e3 = [enc3(x)[:2] for x in xs]
    e4 = [enc4(x)[:2] for x in xs]
    e5 = [enc5(x)[:2] for x in xs]
    enc5_calls = [lambda x=x: enc5(x)[1] for x in xs]
    dec3_calls = [lambda k=k, d=d: dec3(k, d) for k, d in e3]
    dec4_calls = [lambda k=k, d=d: dec4(k, d) for k, d in e4]
    dec5_calls = [lambda k=k, d=d: dec5(k, d) for k, d in e5]

    for name, calls in (("enc4", enc4_calls), ("enc5", enc5_calls),
                        ("dec4", dec4_calls), ("dec5", dec5_calls)):
        g = measure(calls, nbytes)
        print(f"{name}: {g:.3f} GB/s")


if __name__ == "__main__":
    main()
