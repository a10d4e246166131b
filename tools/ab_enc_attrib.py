"""Encode time attribution: which stage of codec4 encode costs what.

Variants (timing only; C/D/E produce wrong bytes by construction):
  A  full encode (XLA key pass + kernel)
  B  kernel only (keys dropped from the jitted output)
  C  B with the alignment dyn-shift monkeypatched to identity
  D  C with routing monkeypatched out
  E  D with the prefix sum monkeypatched to identity
  F  B at block=65536
"""

import functools
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

from vbz_compression_tpu.ops import pallas_codec4 as pc4

B, N = 4, 4 * 1024 * 1024
BLOCK = 32768
SLACK = 2048


def make_signal(total_values, seed=42):
    rng = np.random.default_rng(seed)
    sig = 500 + np.cumsum(rng.normal(0, 12, total_values))
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
    raw = pc4.encode_w2.__wrapped__

    def build(block=BLOCK, data_only=False):
        if data_only:
            def f(x):
                return raw(x, block=block, flavor="zz16", slack=SLACK)[1]
        else:
            def f(x):
                return raw(x, block=block, flavor="zz16", slack=SLACK)
        return jax.jit(f)

    results = {}

    def bench(name, fn, pick=lambda r: r):
        calls = [lambda x=x: pick(fn(x)) for x in xs]
        calls[0]()  # compile
        g = measure(calls, N * 2)
        results[name] = g
        print(f"{name}: {g:.3f} GB/s", flush=True)

    bench("A full", build(), pick=lambda r: r[1])
    bench("B kernel-only", build(data_only=True))

    orig_shift = pc4._flat_dyn_shift_right
    pc4._flat_dyn_shift_right = lambda x, a: x
    bench("C no-dyn-shift", build(data_only=True))

    orig_route = pc4._route_msb
    pc4._route_msb = lambda chan, d_bits, extras=(), dmax=None, \
        d_shift=17: (chan,)
    bench("D no-routing", build(data_only=True))

    orig_psum = pc4._flat_prefix_sum_incl
    pc4._flat_prefix_sum_incl = lambda x: x
    bench("E no-psum", build(data_only=True))

    pc4._flat_prefix_sum_incl = orig_psum
    pc4._route_msb = orig_route
    pc4._flat_dyn_shift_right = orig_shift
    bench("F block-64k", build(block=65536, data_only=True))


if __name__ == "__main__":
    main()
