"""Hardware round-trip sweep across every data-adaptive dispatch boundary
of the codec5 kernels (run on the real chip; CI covers the same logic in
interpret mode only, and Mosaic can miscompile cond structures interpret
mode accepts).

Covers: e_sum at each sparse-replay quarter bound (4/8/12/16) and one
past it, the encode range-gate threshold (16), mid-range dense-ladder
values, the compact-overflow transition into the general kernels, and
wire-format key identity vs the NumPy oracle. First run 2026-08-21: all
clean (see ROADMAP round-4 ledger).

Prints one JSON line: {"boundary_chip": "ok", "cases": n} or asserts.
"""

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np  # noqa: E402
import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402

from vbz_compression_tpu.ops import pallas_codec5 as pc5  # noqa: E402
from vbz_compression_tpu.ops import scalar  # noqa: E402

BLOCK, SLACK, GBLOCK = 65536, 2048, 16384
N = 4 * BLOCK


def make_sig(e_per_block: int) -> np.ndarray:
    """Walk with ~e_per_block two-byte deltas per 64K block."""
    rng = np.random.default_rng(100 + e_per_block)
    sig = np.clip(500 + np.cumsum(rng.normal(0, 12, N)), -2000,
                  2000).astype(np.int16)
    for b in range(N // BLOCK):
        base = b * BLOCK
        for k in range(e_per_block):
            pos = base + 37 + k * (BLOCK // max(e_per_block, 1) - 7)
            sig[pos] = np.int16(int(sig[pos - 1]) + 300 + 13 * k & 0x7FFF)
    return sig


def main() -> None:
    @jax.jit
    def enc(x2):
        return pc5.encode_w2_rows_flat(x2, 1, block=BLOCK, flavor="zz16",
                                       slack=SLACK)

    @jax.jit
    def dec(k2, dd):
        return pc5.decode_w2_rows_flat(k2, dd, 1, block=BLOCK,
                                       flavor="zz16", slack=SLACK)

    @jax.jit
    def encg(x):
        return pc5.encode_w2_general(x, block=GBLOCK, flavor="zz16")

    @jax.jit
    def decg(k, d):
        return pc5.decode_w2_general(
            k, d, pc5.block_offsets_from_keys_flat(k, GBLOCK),
            block=GBLOCK, flavor="zz16")

    def roundtrip(sig):
        x2 = jax.device_put(jnp.asarray(sig.reshape(-1, 128)))
        k2, dd, _lens, ovf = enc(x2)
        if int(jnp.sum(ovf)[None][0]) == 0:
            m = int(jnp.sum(jnp.abs(
                dec(k2, dd).astype(jnp.int32)
                - x2.astype(jnp.int32)))[None][0])
            keys_np = np.asarray(k2).reshape(-1)
            ref = scalar.svb_compress(sig, 2, True, 0)
            assert keys_np[: N // 4].tobytes() == ref[: N // 4], \
                "wire key mismatch"
            return m
        xg = jax.device_put(jnp.asarray(sig))
        kg, dg, _t = encg(xg)
        return int(jnp.sum(jnp.abs(
            decg(kg, dg).astype(jnp.int32)
            - xg.astype(jnp.int32)))[None][0])

    cases = 0
    # e values straddle every decode-dispatch boundary: the gated-ladder
    # group thresholds (e_sum 16 and 256), the hybrid's grouped/straight
    # switch (255/256), and the compact-overflow transition (2048).
    for e in (0, 1, 3, 4, 5, 7, 8, 9, 12, 13, 15, 16, 17, 20, 100,
              254, 255, 256, 257, 650, 1500, 2047, 2048):
        m = roundtrip(make_sig(e))
        assert m == 0, f"boundary e={e}: mismatch {m}"
        cases += 1
    rng = np.random.default_rng(0)
    for sigma in (120, 160, 200):
        sig = np.clip(np.cumsum(rng.normal(0, sigma, N)), -30000,
                      30000).astype(np.int16)
        m = roundtrip(sig)
        assert m == 0, f"sigma={sigma}: mismatch {m}"
        cases += 1

    # Dense leftward network gate boundaries (c0_sum 512 and 8192): mix
    # incompressible content with exactly c0 small values per block.
    from vbz_compression_tpu.ops import pallas_dense as pcd

    @jax.jit
    def encd(x):
        return pcd.encode_w2_dense(x, block=BLOCK)

    @jax.jit
    def decd(k, d):
        return pcd.decode_w2_dense(
            k, d, pc5.block_offsets_from_keys_flat(k, BLOCK), block=BLOCK)

    for c0 in (0, 1, 511, 512, 513, 8191, 8192, 8193, 40000):
        sig = rng.integers(-32768, 32767, N, dtype=np.int16)
        # zigzag(delta) < 256 <=> code 0; plant c0 tiny deltas per block
        for b in range(N // BLOCK):
            base = b * BLOCK
            step = max(BLOCK // max(c0, 1) - 1, 1)
            idx = (base + 1 + np.arange(c0) * step)[:c0]
            idx = idx[idx < base + BLOCK]
            # dense plants overflow the strided layout: go contiguous
            if idx.size < c0:
                idx = base + 1 + np.arange(c0)
            for pos in idx:
                v = (int(sig[pos - 1]) + 5) & 0xFFFF
                sig[pos] = v - 65536 if v >= 32768 else v
        xg = jax.device_put(jnp.asarray(sig))
        kg, dg, _t = encd(xg)
        keys_np = np.asarray(kg)
        ref = scalar.svb_compress(sig, 2, True, 0)
        assert keys_np[: N // 4].tobytes() == ref[: N // 4], \
            f"dense c0={c0}: wire key mismatch"
        m = int(jnp.sum(jnp.abs(decd(kg, dg).astype(jnp.int32)
                                - xg.astype(jnp.int32)))[None][0])
        assert m == 0, f"dense c0={c0}: mismatch {m}"
        cases += 1
    print(json.dumps({"boundary_chip": "ok", "cases": cases,
                      "platform": jax.devices()[0].platform}))


if __name__ == "__main__":
    main()
