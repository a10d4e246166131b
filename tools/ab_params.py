"""Parameter sweep: codec5 (block, slack) on the clean-signal bench."""

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

from vbz_compression_tpu.ops import pallas_codec5 as pc5

B, N = 4, 4 * 1024 * 1024


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
    rng = np.random.default_rng(42)
    sig = np.clip(500 + np.cumsum(rng.normal(0, 12, (B, N)), axis=1),
                  -2000, 2000).astype(np.int16)
    xs = [jax.device_put(jnp.asarray(r)) for r in sig]

    for block, slack in ((32768, 2048), (32768, 1024), (65536, 2048),
                         (131072, 2048), (65536, 4096)):
        def enc(x, block=block, slack=slack):
            return pc5.encode_w2(x, block=block, flavor="zz16", slack=slack)

        def dec(keys, data, block=block, slack=slack):
            boffs = pc5.block_offsets_from_keys_flat(keys, block)
            return pc5.decode_w2(keys, data, boffs, block=block,
                                 flavor="zz16", slack=slack)

        enc = jax.jit(enc)
        dec = jax.jit(dec)
        try:
            k, d, t, ovf = enc(xs[0])
            assert int(ovf[None][0]) == 0
            o = dec(k, d)
            m = int(jnp.sum(jnp.abs(o.astype(jnp.int32)
                                    - xs[0].astype(jnp.int32)))[None][0])
            assert m == 0
            encoded = [enc(x)[:2] for x in xs]
            e = measure([lambda x=x: enc(x)[1] for x in xs], N * 2)
            dd = measure([lambda k=k, d=d: dec(k, d)
                          for k, d in encoded], N * 2)
            print(f"block={block} slack={slack}: enc {e:.1f} dec {dd:.1f} "
                  f"GB/s", flush=True)
        except Exception as exc:
            print(f"block={block} slack={slack}: FAIL "
                  f"{type(exc).__name__}: {str(exc)[:150]}", flush=True)


if __name__ == "__main__":
    main()
