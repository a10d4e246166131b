"""Interleaved A/B: codec3 W4 kernels vs the dense-W4 deletion kernels.

Run on the real chip. 2026-08-21 result (volatile window, medians):
zz32 enc 13.0 vs 4.1 / dec 8.4 vs 3.8; none16 enc 6.1 vs 2.1 / dec 5.9
vs 1.3 — dense-W4 shipped as the production route for chunks >= 16384
values. A block sweep (16384 vs 32768) showed 32K WORSE for zz32 encode
(9.7 vs 12.6; extra d_bits stage + bigger arrays eat the fixed saving)
and a wash elsewhere: block 16384 stays.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp
from vbz_compression_tpu.ops import pallas_w4 as pw4, pallas_codec3 as pc3

B = 4
N = 1024 * 1024

def fence(a): return float(jnp.sum(a.astype(jnp.int32).ravel()[:8])[None][0])

def measure(calls, nbytes):
    def run(r):
        t0=time.perf_counter(); last=None
        for _ in range(r):
            for c in calls: last = c()
        fence(last); return time.perf_counter()-t0
    run(1)
    samples = []
    for _ in range(10):
        s = (run(24)-run(4))/(20*len(calls))
        if s > 0: samples.append(s)
        if len(samples) >= 3: break
    return nbytes / sorted(samples)[1] / 1e9 if len(samples) >= 2 else 0.0

rng = np.random.default_rng(5)
content = {
    "zz32": ([np.cumsum(rng.integers(-2000, 2000, N)).astype(np.int32) for _ in range(B)], 4),
    "none16": ([np.clip(500 + np.cumsum(rng.normal(0, 12, N)), 0, 2000).astype(np.int16) for _ in range(B)], 2),
}

for flavor, (rows, isz) in content.items():
    @jax.jit
    def enc_d(x, flavor=flavor): return pw4.encode_w4_dense(x, block=16384, flavor=flavor)
    @jax.jit
    def dec_d(k, d, bo, flavor=flavor): return pw4.decode_w4_dense(k, d, bo, block=16384, flavor=flavor)
    @jax.jit
    def offs_d(k): return pw4.byte_offsets_from_keys_w4(k, 16384)
    @jax.jit
    def enc_3(x, flavor=flavor): return pc3.encode_w4(x, block=8192, flavor=flavor)
    @jax.jit
    def dec_3(k, d, flavor=flavor):
        bo = pc3.block_offsets_from_keys(k, 8192, four_byte_codes=True)
        return pc3.decode_w4(k, d, bo, block=8192, flavor=flavor)

    xs = [jax.device_put(jnp.asarray(r)) for r in rows]
    enc_ds = []
    for x in xs:
        k, d, _ = enc_d(x)
        enc_ds.append((k, d, offs_d(k)))
    enc_3s = [enc_3(x)[:2] for x in xs]
    nbytes = N * isz
    calls = {
        "enc codec3": [lambda x=x: enc_3(x)[1] for x in xs],
        "enc dense": [lambda x=x: enc_d(x)[1] for x in xs],
        "dec codec3": [lambda k=k, d=d: dec_3(k, d) for k, d in enc_3s],
        "dec dense": [lambda k=k, d=d, bo=bo: dec_d(k, d, bo) for k, d, bo in enc_ds],
    }
    samples = {v: [] for v in calls}
    for _ in range(4):
        for vname, cs in calls.items():
            samples[vname].append(measure(cs, nbytes))
    for vname, ss in samples.items():
        print(f"{flavor} {vname}: best {max(ss):.2f} GB/s  [{' '.join(f'{s:.1f}' for s in ss)}]", flush=True)
