"""Within-run A/B: dense leftward-compaction network vs the general
kernel on the dense-regime tiers (VERDICT r4 #2: measure, don't estimate).

Workloads:
  hard — uniform random int16 (c0 ~ 0.4%/block: the dense network's home
         regime; the general kernel runs its full depth at block 16384)
  s200 — sigma=200 walk (c0 ~ 48%: the dense network's worst case — all
         gated stage groups active)

Variants: general (production fallback, block 16384 single-channel) vs
dense (pallas_dense, block 65536 single-channel, depth log2(c0_sum)).
Both produce identical wire bytes (asserted).
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
from vbz_compression_tpu.ops import pallas_dense as pcd  # noqa: E402

B, N = 4, 4 * 1024 * 1024
BLOCK_G = 16384
BLOCK_D = 65536


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
    rng = np.random.default_rng(13)
    cases = {
        "hard": rng.integers(-32768, 32767, (B, N), dtype=np.int16),
        "s200": workload("s200", 32, 200, -30000, 30000, 3).reshape(B, N),
    }

    @jax.jit
    def enc_g(x):
        return pc5.encode_w2_general(x, block=BLOCK_G)

    @jax.jit
    def dec_g(keys, data):
        boffs = pc5.block_offsets_from_keys_flat(keys, BLOCK_G)
        return pc5.decode_w2_general(keys, data, boffs, block=BLOCK_G)

    @jax.jit
    def enc_d(x):
        return pcd.encode_w2_dense(x, block=BLOCK_D)

    @jax.jit
    def dec_d(keys, data):
        boffs = pc5.block_offsets_from_keys_flat(keys, BLOCK_D)
        return pcd.decode_w2_dense(keys, data, boffs, block=BLOCK_D)

    for cname, sig in cases.items():
        xs = [jax.device_put(jnp.asarray(r)) for r in sig]
        enc_gs = [enc_g(x)[:2] for x in xs]
        enc_ds = [enc_d(x)[:2] for x in xs]
        # wire identity + round trips, on device
        kg, dg = enc_gs[0]
        kd, dd = enc_ds[0]
        mk = int(jnp.sum(jnp.abs(kg.astype(jnp.int32)
                                 - kd.astype(jnp.int32)))[None][0])
        assert mk == 0, f"{cname}: key mismatch"
        for dec, (k, d) in (("g", enc_gs[0]), ("d", enc_ds[0])):
            o = dec_g(k, d) if dec == "g" else dec_d(k, d)
            m = int(jnp.sum(jnp.abs(o.astype(jnp.int32)
                                    - xs[0].astype(jnp.int32)))[None][0])
            assert m == 0, f"{cname}/{dec} round-trip ({m})"
        # cross: dense decode of general-encoded bytes (same wire)
        o = dec_d(kg, dg)
        m = int(jnp.sum(jnp.abs(o.astype(jnp.int32)
                                - xs[0].astype(jnp.int32)))[None][0])
        assert m == 0, f"{cname}: cross decode ({m})"

        calls = {
            "enc general": [lambda x=x: enc_g(x)[1] for x in xs],
            "enc dense": [lambda x=x: enc_d(x)[1] for x in xs],
            "dec general": [lambda k=k, d=d: dec_g(k, d)
                            for k, d in enc_gs],
            "dec dense": [lambda k=k, d=d: dec_d(k, d)
                          for k, d in enc_ds],
        }
        samples = {v: [] for v in calls}
        for _ in range(5):
            for vname, cs in calls.items():
                samples[vname].append(measure(cs, N * 2))
        for vname, ss in samples.items():
            print(f"{cname} {vname}: best {max(ss):.1f} GB/s  "
                  f"[{' '.join(f'{s:.1f}' for s in ss)}]", flush=True)


if __name__ == "__main__":
    main()
