"""Decode-side component attribution on the realistic tier.

Probe kernels (stub="probe:<mode>" in pallas_codec5) run straight-line
partial pipelines with constant downstream cost; pairwise deltas between
modes give per-component µs/block:

  none    — fetch + widen + align + keys + psum16 un-delta + store
  psum    — + the E prefix sum (MXU lane psum + cross-row ladder)
  asm     — + the 16-bit w assembly (shift + or)
  lvlK    — + K straight-line sparse select levels
  full    — the production kernel (round-trip-correct; quarters gating)

All variants share the fixed grid/DMA/zigzag/un-delta costs, so the
deltas isolate exactly the sparse-replay pipeline the realistic tier pays.
"""

import os
import subprocess
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

from vbz_compression_tpu.ops import pallas_codec5 as pc5  # noqa: E402

B, N = 4, 4 * 1024 * 1024
BLOCK, SLACK = 65536, 2048
BLOCKS_PER_CALL = B * N // BLOCK


def fence(arr):
    return float(jnp.sum(arr.astype(jnp.int32).ravel()[:8])[None][0])


def measure_us(calls):
    """µs per block (per call / blocks per call)."""
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
    s = sorted((run(r_hi) - run(r_lo)) / ((r_hi - r_lo) * len(calls))
               for _ in range(3))[1]
    return s * 1e6 / (N // BLOCK)


def workload(tag, mb, sigma, lo, hi, seed):
    path = f"/tmp/vbz_bench_{tag}_{mb}mb_{sigma}_{seed}.bin"
    if not (os.path.exists(path) and os.path.getsize(path) == mb << 20):
        subprocess.run([os.path.join(REPO, "native", "gen_signal"), path,
                        str(mb), str(sigma), str(lo), str(hi), str(seed)],
                       check=True)
    return np.fromfile(path, dtype=np.int16)


def main():
    sig = workload("clean", 32, 12, 0, 2000, 42).reshape(B, N)

    @jax.jit
    def enc(x):
        return pc5.encode_w2(x, block=BLOCK, flavor="zz16", slack=SLACK)

    def make_dec(stub):
        @jax.jit
        def dec(keys, data):
            boffs = pc5.block_offsets_from_keys_flat(keys, BLOCK)
            return pc5.decode_w2(keys, data, boffs, block=BLOCK,
                                 flavor="zz16", slack=SLACK, stub=stub)
        return dec

    modes = ["probe:none", "probe:psum", "probe:asm", "probe:lvl1",
             "probe:lvl4", "probe:lvl8", "probe:lvl16", ""]
    xs = [jax.device_put(jnp.asarray(r)) for r in sig]
    encoded = [enc(x)[:2] for x in xs]
    calls = {}
    for mode in modes:
        dec = make_dec(mode)
        dec(*encoded[0])  # compile
        calls[mode or "full"] = [lambda k=k, d=d, dec=dec: dec(k, d)
                                 for k, d in encoded]
    samples = {v: [] for v in calls}
    for _ in range(5):
        for vname, cs in calls.items():
            samples[vname].append(measure_us(cs))
    for vname, ss in samples.items():
        med = sorted(ss)[len(ss) // 2]
        print(f"{vname:12s}: {min(ss):6.2f} us/block best, {med:6.2f} med  "
              f"[{' '.join(f'{s:.2f}' for s in ss)}]", flush=True)


if __name__ == "__main__":
    main()
