"""Run the production SHARDED codec5 plane COMPILED on the real chip.

The 8-device dryrun exercises this plane under interpret mode on a CPU mesh
(__graft_entry__.dryrun_multichip); bench.py runs compiled Pallas but
unsharded. This check closes the remaining gap (VERDICT r2 missing #4):
shard_map + Mosaic *compiled*, on a 1-device mesh on the real TPU —
round-trip asserted on device, throughput via the slope method.

Usage: python tools/check_sharded_chip.py
"""

import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    import jax
    import jax.numpy as jnp

    cache_dir = os.path.join(REPO, ".jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from vbz_compression_tpu.parallel import sharded

    dev = jax.devices()[0]
    assert dev.platform == "tpu", f"need the real chip, got {dev}"
    mesh = sharded.make_mesh([dev])

    B, N, BLOCK = 4, 4 * 1024 * 1024, 32768
    rng = np.random.default_rng(7)
    sig = np.clip(500 + np.cumsum(rng.normal(0, 12, (B, N)), axis=1),
                  -2000, 2000).astype(np.int16)

    xs = sharded.shard_batch(mesh, sig)
    enc = lambda a: sharded.batch_encode_sharded_pallas5(  # noqa: E731
        a, mesh=mesh, block=BLOCK)
    keys, data, lens, total, n_ovf = enc(xs)
    assert int(n_ovf) == 0, "unexpected compact overflow on signal"
    dec = lambda k, d: sharded.batch_decode_sharded_pallas5(  # noqa: E731
        k, d, mesh=mesh, block=BLOCK)
    out = dec(keys, data)

    # Round-trip asserted ON DEVICE (scalar pull only).
    m = int(jnp.sum(jnp.abs(out.astype(jnp.int32)
                            - xs.astype(jnp.int32)))[None][0])
    assert m == 0, f"sharded compiled round-trip mismatch: {m}"
    print(f"round-trip ok on {dev} (compiled shard_map, 1-device mesh); "
          f"{int(total)} compressed bytes for {sig.nbytes}", file=sys.stderr)

    # Slope-method throughput (see bench.py for why block_until_ready is
    # not usable on the axon tunnel).
    def fence(arr):
        return float(jnp.sum(arr.astype(jnp.int32).ravel()[:8])[None][0])

    def run(fn_call, r):
        t0 = time.perf_counter()
        last = None
        for _ in range(r):
            last = fn_call()
        fence(last if not isinstance(last, tuple) else last[1])
        return time.perf_counter() - t0

    nbytes = sig.nbytes
    for name, call in [("encode", lambda: enc(xs)),
                       ("decode", lambda: dec(keys, data))]:
        run(call, 1)
        r_lo, r_hi = 2, 12
        s = sorted((run(call, r_hi) - run(call, r_lo)) / (r_hi - r_lo)
                   for _ in range(3))[1]
        print(f"sharded {name}: {nbytes / s / 1e9:.2f} GB/s", file=sys.stderr)
    print("ok")


if __name__ == "__main__":
    main()
