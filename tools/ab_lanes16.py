"""A/B: i32-channel vs i16-lane routing in the compact W2 kernels.

Slope-method timing on the real chip (see bench.py for methodology).
Usage: python tools/ab_lanes16.py
"""

import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax  # noqa: E402

cache_dir = os.path.join(REPO, ".jax_cache")
os.makedirs(cache_dir, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402

from vbz_compression_tpu.ops import pallas_codec3 as pc3  # noqa: E402

B, N = 4, 4 * 1024 * 1024
BLOCK = 32768
SLACK = 2048


def make_signal(total_values: int, seed: int = 42) -> np.ndarray:
    rng = np.random.default_rng(seed)
    steps = rng.normal(0, 12, total_values)
    sig = 500 + np.cumsum(steps)
    return np.clip(sig, -2000, 2000).astype(np.int16)


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


def measure(calls, label):
    r_lo, r_hi = 4, 44
    run_passes(calls, 1)
    samples = sorted(
        (run_passes(calls, r_hi) - run_passes(calls, r_lo))
        / ((r_hi - r_lo) * len(calls)) for _ in range(3))
    s = samples[1]
    gbps = (N * 2) / s / 1e9
    print(f"{label}: {gbps:.3f} GB/s  (samples "
          f"{[f'{(N * 2) / x / 1e9:.2f}' for x in samples]})")
    return gbps


def main():
    sig = make_signal(B * N).reshape(B, N)
    xs = [jax.device_put(jnp.asarray(row)) for row in sig]

    # lanes16=True is interpret-mode-only today: Mosaic cannot rotate
    # non-32-bit vectors (see ROADMAP.md). Flip to (False, True) to re-probe
    # on a newer toolchain.
    for lanes16 in (False,):
        @jax.jit
        def enc(x, l16=lanes16):
            return pc3.encode_w2(x, block=BLOCK, flavor="zz16",
                                 slack=SLACK, lanes16=l16)

        @jax.jit
        def dec(keys, data, l16=lanes16):
            boffs = pc3.block_offsets_from_keys(keys, BLOCK)
            return pc3.decode_w2(keys, data, boffs, block=BLOCK,
                                 flavor="zz16", slack=SLACK, lanes16=l16)

        k0, d0, _, ov = enc(xs[0])
        o0 = dec(k0, d0)
        m = int(jnp.sum(jnp.abs(o0.astype(jnp.int32)
                                - xs[0].astype(jnp.int32)))[None][0])
        assert int(ov[None][0]) == 0
        assert m == 0, f"lanes16={lanes16} round-trip mismatch: {m}"
        print(f"lanes16={lanes16}: round-trip bit-exact on chip")

        encoded = [enc(row)[:2] for row in xs]
        enc_calls = [lambda row=row, e=enc: e(row)[1] for row in xs]
        dec_calls = [lambda k=e[0], d=e[1], f=dec: f(k, d) for e in encoded]
        eg = measure(enc_calls, f"encode lanes16={lanes16}")
        dg = measure(dec_calls, f"decode lanes16={lanes16}")
        print(f"combined lanes16={lanes16}: "
              f"{2 * eg * dg / (eg + dg):.3f} GB/s")


if __name__ == "__main__":
    main()
