"""Within-run A/B on the batched-grid ENCODE gap (ROADMAP open question):
encode_w2_rows on [B, N] vs B separate encode_w2 calls, plus B=1 rows (the
same grid as encode_w2 — isolates the batched-kernel machinery from the
multi-row grid), swept over B.

Usage: python tools/ab_rows_encode.py
"""

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

from vbz_compression_tpu.ops import pallas_codec5 as pc5  # noqa: E402

N = 4 * 1024 * 1024
BLOCK, SLACK = 65536, 2048


def fence(arr):
    return float(jnp.sum(arr.astype(jnp.int32).ravel()[:8])[None][0])


def measure(call, nbytes, reps=3):
    def run(r):
        t0 = time.perf_counter()
        last = None
        for _ in range(r):
            last = call()
        fence(last)
        return time.perf_counter() - t0

    r_lo, r_hi = 4, 24
    run(1)
    s = sorted((run(r_hi) - run(r_lo)) / (r_hi - r_lo)
               for _ in range(reps))[1]
    return nbytes / s / 1e9


def main():
    rng = np.random.default_rng(0)
    sig = np.clip(500 + np.cumsum(rng.normal(0, 12, (4, N)), axis=1),
                  -2000, 2000).astype(np.int16)

    @jax.jit
    def enc1(x):
        return pc5.encode_w2(x, block=BLOCK, flavor="zz16", slack=SLACK)[1]

    encB = {}
    for b in (1, 2, 4):
        for g2 in (False, True):
            @jax.jit
            def e(xb, g2=g2):
                return pc5.encode_w2_rows(xb, block=BLOCK, flavor="zz16",
                                          slack=SLACK, grid2d=g2)[1]

            encB[(b, g2)] = e

    xs = [jax.device_put(jnp.asarray(r)) for r in sig]
    xbs = {b: jax.device_put(jnp.asarray(sig[:b])) for b in (1, 2, 4)}

    variants = {"per-row x4": (lambda: [enc1(x) for x in xs][-1], 4 * N * 2)}
    for (b, g2), e in encB.items():
        tag = "2d" if g2 else "flat"
        variants[f"rows B={b} {tag}"] = (
            lambda e=e, b=b: e(xbs[b]), b * N * 2)
    for name, (call, _) in variants.items():
        call()  # compile
    best = {v: 0.0 for v in variants}
    for _ in range(4):
        for name, (call, nbytes) in variants.items():
            best[name] = max(best[name], measure(call, nbytes))
    for name, gbps in best.items():
        print(f"{name}: enc {gbps:.1f} GB/s", flush=True)


if __name__ == "__main__":
    main()
