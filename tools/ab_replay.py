"""Within-run A/B: recorded-masks replay (round 2) vs mask-free fused
replay (round 3) on the codec5 decode, mixed + clean content.

Usage: git show <old-rev>:vbz_compression_tpu/ops/pallas_codec5.py \
           > /tmp/pc5_old.py   # then sed relative imports to absolute
       python tools/ab_replay.py

Chip variance is +-20-30% BETWEEN runs (ROADMAP), so only a same-process
comparison is meaningful.
"""

import importlib.util
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402

from vbz_compression_tpu.ops import pallas_codec5 as pc5_new  # noqa: E402

spec = importlib.util.spec_from_file_location("pc5_old", "/tmp/pc5_old.py")
pc5_old = importlib.util.module_from_spec(spec)
sys.modules["pc5_old"] = pc5_old
spec.loader.exec_module(pc5_old)

B, N = 4, 4 * 1024 * 1024
BLOCK, SLACK = 65536, 2048


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
    s = sorted((run(r_hi) - run(r_lo)) / ((r_hi - r_lo) * len(calls))
               for _ in range(3))[1]
    return nbytes / s / 1e9


def main():
    rng = np.random.default_rng(0)
    cases = {
        "clean (sigma=12)": np.clip(
            500 + np.cumsum(rng.normal(0, 12, (B, N)), axis=1),
            -2000, 2000).astype(np.int16),
        "mixed (sigma=50)": np.clip(
            np.cumsum(rng.normal(0, 50, (B, N)), axis=1),
            -30000, 30000).astype(np.int16),
    }

    variants = {}
    for name, mod in (("old-masks", pc5_old), ("new-fused", pc5_new)):
        @jax.jit
        def enc(x, mod=mod):
            return mod.encode_w2(x, block=BLOCK, flavor="zz16", slack=SLACK)

        @jax.jit
        def dec(keys, data, mod=mod):
            boffs = mod.block_offsets_from_keys_flat(keys, BLOCK)
            return mod.decode_w2(keys, data, boffs, block=BLOCK,
                                 flavor="zz16", slack=SLACK)

        variants[name] = (enc, dec)

    for cname, sig in cases.items():
        xs = [jax.device_put(jnp.asarray(r)) for r in sig]
        calls = {}
        for vname, (enc, dec) in variants.items():
            k, d, t, ovf = enc(xs[0])
            assert int(ovf[None][0]) == 0
            o = dec(k, d)
            m = int(jnp.sum(jnp.abs(o.astype(jnp.int32)
                                    - xs[0].astype(jnp.int32)))[None][0])
            assert m == 0, f"{cname}/{vname} round-trip"
            encoded = [enc(x)[:2] for x in xs]
            calls[vname] = [lambda k=k, d=d, dec=dec: dec(k, d)
                            for k, d in encoded]
        # Interleave variants across 4 alternating samples and keep each
        # variant's BEST — tunnel/chip contention drifts on second scales
        # and would otherwise bias whichever variant ran in the bad window.
        best = {v: 0.0 for v in calls}
        for _ in range(4):
            for vname, cs in calls.items():
                best[vname] = max(best[vname], measure(cs, N * 2))
        for vname, dd in best.items():
            print(f"{cname} {vname}: dec {dd:.1f} GB/s")


if __name__ == "__main__":
    main()
