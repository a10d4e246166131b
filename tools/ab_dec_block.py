"""Within-run A/B: decode block size 64K vs 128K vs 256K (hybrid replay).

The wire format is block-agnostic, so the decode may use LARGER blocks
than the encode: a 2x block halves the per-grid-step fixed cost
(~1.2 us/step) and merges the two E-prefix ladders into one — the
"process two blocks per step" VERDICT r4 #1(a) idea is literally just a
bigger decode block. e_sum per block doubles (one more gated ladder
stage pair on realistic). 128K failed to COMPILE in round 2 when the
recorded-mask replay's VMEM footprint was the cap; the fused replay
removed that — re-probe.
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
        # Encode stays at the swept-best 64K/2048 geometry.
        return pc5.encode_w2(x, block=BLOCK, flavor="zz16", slack=SLACK)

    def make_dec(blk):
        @jax.jit
        def dec(keys, data):
            boffs = pc5.block_offsets_from_keys_flat(keys, blk)
            return pc5.decode_w2(keys, data, boffs, block=blk,
                                 flavor="zz16", slack=SLACK)
        return dec

    variants = {}
    for blk in (65536, 131072, 262144):
        try:
            dec = make_dec(blk)
            k, d, _t, _o = enc(jax.device_put(
                jnp.asarray(cases["realistic"][0])))
            dec(k, d).block_until_ready()
            variants[f"b{blk // 1024}k"] = dec
        except Exception as exc:
            print(f"block {blk}: fails to compile/run "
                  f"({type(exc).__name__})", flush=True)

    for cname, sig in cases.items():
        xs = [jax.device_put(jnp.asarray(r)) for r in sig]
        encoded = [enc(x)[:2] for x in xs]
        calls = {}
        for vname, dec in variants.items():
            o = dec(*encoded[0])
            m = int(jnp.sum(jnp.abs(o.astype(jnp.int32)
                                    - xs[0].astype(jnp.int32)))[None][0])
            assert m == 0, f"{cname}/{vname} round-trip ({m})"
            calls[vname] = [lambda k=k, d=d, dec=dec: dec(k, d)
                            for k, d in encoded]
        samples = {v: [] for v in calls}
        for _ in range(5):
            for vname, cs in calls.items():
                samples[vname].append(measure(cs, N * 2))
        for vname, ss in samples.items():
            print(f"{cname} {vname}: dec best {max(ss):.1f} GB/s  "
                  f"[{' '.join(f'{s:.1f}' for s in ss)}]", flush=True)


if __name__ == "__main__":
    main()
