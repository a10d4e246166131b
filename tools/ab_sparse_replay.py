"""Within-run A/B: sparse per-level select replay vs the dense push/pull
ladder on the codec5 decode (sparse_max=10 vs 0 — same module, the
dispatch bound is a static arg).

Workloads: the realistic pseudo-read tier (3-15 extras per 64K block — the
sparse regime), mixed sigma=50 (~650 extras/block — dense either way, the
dispatch must not slow it), and pure (e_sum=0 — replay skipped, sanity).

Chip variance is +-20-30% between runs; only this same-process interleaved
comparison is meaningful (best-of-4 alternating samples).
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


def workload(tag, mb, sigma, lo, hi, seed):
    path = f"/tmp/vbz_bench_{tag}_{mb}mb_{sigma}_{seed}.bin"
    if not (os.path.exists(path) and os.path.getsize(path) == mb << 20):
        subprocess.run([os.path.join(REPO, "native", "gen_signal"), path,
                        str(mb), str(sigma), str(lo), str(hi), str(seed)],
                       check=True)
    return np.fromfile(path, dtype=np.int16)


def main():
    rng = np.random.default_rng(11)
    cases = {
        "realistic": workload("clean", 32, 12, 0, 2000, 42).reshape(B, N),
        "mixed": workload("mixed", 32, 50, -30000, 30000, 7).reshape(B, N),
        "pure": np.clip(500 + np.cumsum(rng.normal(0, 12, (B, N)), axis=1),
                        -2000, 2000).astype(np.int16),
    }

    @jax.jit
    def enc(x):
        return pc5.encode_w2(x, block=BLOCK, flavor="zz16", slack=SLACK)

    variants = {}
    for name, sm in (("dense", 0), ("sparse", 10)):
        @jax.jit
        def dec(keys, data, sm=sm):
            boffs = pc5.block_offsets_from_keys_flat(keys, BLOCK)
            return pc5.decode_w2(keys, data, boffs, block=BLOCK,
                                 flavor="zz16", slack=SLACK, sparse_max=sm)

        variants[name] = dec

    for cname, sig in cases.items():
        xs = [jax.device_put(jnp.asarray(r)) for r in sig]
        k0, d0, t0_, ovf = enc(xs[0])
        assert int(ovf[None][0]) == 0, cname
        calls = {}
        for vname, dec in variants.items():
            o = dec(k0, d0)
            m = int(jnp.sum(jnp.abs(o.astype(jnp.int32)
                                    - xs[0].astype(jnp.int32)))[None][0])
            assert m == 0, f"{cname}/{vname} round-trip"
            encoded = [enc(x)[:2] for x in xs]
            calls[vname] = [lambda k=k, d=d, dec=dec: dec(k, d)
                            for k, d in encoded]
        best = {v: 0.0 for v in calls}
        for _ in range(4):
            for vname, cs in calls.items():
                best[vname] = max(best[vname], measure(cs, N * 2))
        for vname, dd in best.items():
            print(f"{cname} {vname}: dec {dd:.1f} GB/s", flush=True)


if __name__ == "__main__":
    main()
