"""Within-run A/B: range-gated dense ladder (sparse_max=-1) vs the sparse
per-level select (sparse_max=16, production) on the codec5 decode.

The attribution probe (tools/ab_dec_attrib.py) shows the sparse levels
cost ~0.22 us each and run ~e_sum levels per block — linear. The gated
ladder replays in 2*ceil(log2(e_sum)) stages (~8 for the realistic tier's
e_sum 3-15) behind two conds per pass. Mixed (e_sum ~650) runs both
gated groups — the dispatch must not lose there vs the ungated ladder.
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

    def make_dec(sm):
        @jax.jit
        def dec(keys, data):
            boffs = pc5.block_offsets_from_keys_flat(keys, BLOCK)
            return pc5.decode_w2(keys, data, boffs, block=BLOCK,
                                 flavor="zz16", slack=SLACK, sparse_max=sm)
        return dec

    variants = {"sparse16": make_dec(16), "gladder": make_dec(-1),
                "hybrid": make_dec(-2)}

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
        for _ in range(6):
            for vname, cs in calls.items():
                samples[vname].append(measure(cs, N * 2))
        for vname, ss in samples.items():
            print(f"{cname} {vname}: dec best {max(ss):.1f} GB/s  "
                  f"[{' '.join(f'{s:.1f}' for s in ss)}]", flush=True)


if __name__ == "__main__":
    main()
