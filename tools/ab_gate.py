"""Within-run A/B: per-stage dmax-gated vs straight-line routing stages
on the codec5 compact kernels (the round-4 cond-removal evidence;
encode-side results in the ROADMAP round-4 ledger).
"""
import os, sys, time
REPO="/root/repo"; sys.path.insert(0, REPO)
import numpy as np, jax
jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
from vbz_compression_tpu.ops import pallas_codec5 as pc5
from vbz_compression_tpu.ops import pallas_codec3 as pc3

N = 4*1024*1024
BLOCK, SLACK = 65536, 2048
sig = np.fromfile("/tmp/vbz_bench_clean_32mb_12.0_42.bin", dtype=np.int16)[:N]
mixed = np.fromfile("/tmp/vbz_bench_mixed_32mb_50.0_7.bin", dtype=np.int16)[:N]
rng = np.random.default_rng(11)
pure = np.clip(500 + np.cumsum(rng.normal(0, 12, N)), -2000, 2000).astype(np.int16)
cases = {"realistic": sig, "mixed": mixed, "pure": pure}

orig_route = pc5._route_msb
def route_nogate(chan, d_bits, extras=(), dmax=None, d_shift=pc3.D_SHIFT):
    return orig_route(chan, d_bits, extras=extras, dmax=None, d_shift=d_shift)
orig_fwd = pc5._route_fwd_disp
def fwd_nogate(chan, d_bits, dmax=None):
    return orig_fwd(chan, d_bits, dmax=None)
orig_rev = pc5._reverse_pull_fused
def rev_nogate(chan, d_bits, dmax=None, extras=()):
    return orig_rev(chan, d_bits, dmax=None, extras=extras)

enc_raw = pc5.encode_w2.__wrapped__
dec_raw = pc5.decode_w2.__wrapped__

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

variants = {}
for vname, gated in (("gated", True), ("nogate", False)):
    if gated:
        pc5._route_msb, pc5._route_fwd_disp, pc5._reverse_pull_fused = orig_route, orig_fwd, orig_rev
    else:
        pc5._route_msb, pc5._route_fwd_disp, pc5._reverse_pull_fused = route_nogate, fwd_nogate, rev_nogate
    e = jax.jit(lambda x, g=gated: enc_raw(x, block=BLOCK, flavor="zz16", slack=SLACK)[:2])
    d = jax.jit(lambda k, dd, g=gated: dec_raw(k, dd, pc5.block_offsets_from_keys_flat(k, BLOCK), block=BLOCK, flavor="zz16", slack=SLACK, sparse_max=16))
    encoded = {}
    for cname, s in cases.items():
        xd = jax.device_put(jnp.asarray(s))
        k, dd = e(xd)
        o = d(k, dd)
        m = int(jnp.sum(jnp.abs(o.astype(jnp.int32)-xd.astype(jnp.int32)))[None][0]); assert m==0, (vname, cname)
        encoded[cname] = (xd, k, dd)
    variants[vname] = (e, d, encoded)
pc5._route_msb, pc5._route_fwd_disp, pc5._reverse_pull_fused = orig_route, orig_fwd, orig_rev

best = {}
for rep in range(4):
    for vname, (e, d, encoded) in variants.items():
        for cname, (xd, k, dd) in encoded.items():
            best[(cname,vname,"enc")] = max(best.get((cname,vname,"enc"),0.0), measure(lambda: e(xd)[1], N*2))
            best[(cname,vname,"dec")] = max(best.get((cname,vname,"dec"),0.0), measure(lambda: d(k, dd), N*2))
for key in sorted(best):
    c,v,dirn = key
    print(f"compact {dirn} {c:10s} {v}: {best[key]:.1f} GB/s")
