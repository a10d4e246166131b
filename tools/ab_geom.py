"""Within-run sweep of the compact kernel geometry (block x slack) on
all three content tiers (round-4 negative: 64K/2048 stays best).
"""
import os, sys, time
REPO="/root/repo"; sys.path.insert(0, REPO)
import numpy as np, jax
jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
from vbz_compression_tpu.ops import pallas_codec5 as pc5
B, N = 4, 4*1024*1024
sig = np.fromfile("/tmp/vbz_bench_clean_32mb_12.0_42.bin", dtype=np.int16).reshape(B, N)
mixed = np.fromfile("/tmp/vbz_bench_mixed_32mb_50.0_7.bin", dtype=np.int16).reshape(B, N)
rng = np.random.default_rng(11)
pure = np.clip(500 + np.cumsum(rng.normal(0, 12, (B, N)), axis=1), -2000, 2000).astype(np.int16)
cases = {"realistic": sig, "mixed": mixed, "pure": pure}

def fence(arr): return float(jnp.sum(arr.astype(jnp.int32).ravel()[:8])[None][0])
def measure(call, nbytes):
    def run(r):
        t0=time.perf_counter(); last=None
        for _ in range(r): last=call()
        fence(last); return time.perf_counter()-t0
    run(1)
    pilot = max((run(24)-run(4))/20, 5e-5)
    dr = int(min(max(0.6/pilot, 22), 3000))
    samples=[]
    for _ in range(10):
        s=(run(22+dr)-run(22))/dr
        if s>0: samples.append(s)
        if len(samples)>=4: break
    return nbytes/sorted(samples)[1]/1e9

GEOMS = [(65536, 2048), (65536, 1024), (32768, 2048), (32768, 1024), (16384, 1024)]
variants = {}
for blk, slk in GEOMS:
    @jax.jit
    def e(x2, blk=blk, slk=slk):
        return pc5.encode_w2_rows_flat(x2, B, block=blk, flavor="zz16", slack=slk)
    @jax.jit
    def d(k2, dd, blk=blk, slk=slk):
        return pc5.decode_w2_rows_flat(k2, dd, B, block=blk, flavor="zz16", slack=slk)
    variants[(blk, slk)] = (e, d)

best = {}
data = {}
for cname, rows in cases.items():
    x2 = jax.device_put(jnp.asarray(rows.reshape(B*N//128, 128)))
    for g, (e, d) in variants.items():
        k2, dd, lens, ovf = e(x2)
        novf = int(jnp.sum(ovf)[None][0])
        if novf:
            print(f"{cname} {g}: OVERFLOW ({novf})", flush=True)
            data[(cname,g)] = None
            continue
        o = d(k2, dd)
        m = int(jnp.sum(jnp.abs(o.astype(jnp.int32)-x2.astype(jnp.int32)))[None][0]); assert m==0, (cname, g)
        data[(cname,g)] = (x2, k2, dd)
for rep in range(4):
    for cname in cases:
        for g, (e, d) in variants.items():
            if data[(cname,g)] is None: continue
            x2, k2, dd = data[(cname,g)]
            best[(cname,g,"enc")] = max(best.get((cname,g,"enc"),0.0), measure(lambda: e(x2)[1], B*N*2))
            best[(cname,g,"dec")] = max(best.get((cname,g,"dec"),0.0), measure(lambda: d(k2, dd), B*N*2))
for key in sorted(best, key=str):
    c,g,dirn = key
    print(f"{dirn} {c:10s} block={g[0]:6d} slack={g[1]:5d}: {best[key]:.1f} GB/s")
