"""Compiled sharded-Pallas validation on REAL hardware.

The 8-device dryrun (__graft_entry__.py) exercises the codec5 sharded plane
under interpret mode on a CPU mesh; bench.py runs compiled Pallas but
unsharded. This check closes the remaining gap: run
``batch_encode/decode_sharded_pallas5`` COMPILED through shard_map on a
real-chip mesh (1 device suffices — the shard_map + Mosaic interaction is
what this backend breaks on, not the collective fan-out), assert the
round-trip on device, and report GB/s.

Prints one JSON line: {"sharded_pallas_chip": "ok", "devices": n,
"enc_gb_s": ..., "dec_gb_s": ...}.
"""

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402

from vbz_compression_tpu.parallel import sharded  # noqa: E402

B, N = 4, 4 * 1024 * 1024
BLOCK, SLACK = 65536, 2048


def fence(arr):
    return float(jnp.sum(arr.astype(jnp.int32).ravel()[:8])[None][0])


def measure(call, nbytes):
    """Slope method (see bench.py: block_until_ready returns early on this
    backend; only host pulls fence, so difference two queue depths)."""
    def run(r):
        t0 = time.perf_counter()
        last = None
        for _ in range(r):
            last = call()
        fence(last)
        return time.perf_counter() - t0

    run(1)
    # Same estimator as bench.py (r_lo large, second-best of 5), plus a
    # retry on non-positive slopes: with one 32 MB call per pass the
    # device-time difference can sink below the fence RPC's variance in a
    # bad chip window, flipping the sign.
    r_lo, r_hi = 22, 66
    samples = []
    for _ in range(12):
        s = (run(r_hi) - run(r_lo)) / (r_hi - r_lo)
        if s > 0:
            samples.append(s)
        if len(samples) >= 5:
            break
    assert len(samples) >= 2, "chip window too noisy for a slope estimate"
    return nbytes / sorted(samples)[1] / 1e9


def main() -> None:
    devices = jax.devices()
    mesh = sharded.make_mesh(devices)
    # The batch must divide over the mesh: scale B up to a multiple of the
    # device count (on the usual 1-chip axon target this stays B=4).
    b = -(-B // len(devices)) * len(devices)
    rng = np.random.default_rng(0)
    sig = np.clip(500 + np.cumsum(rng.normal(0, 12, (b, N)), axis=1),
                  -2000, 2000).astype(np.int16)
    x = sharded.shard_batch(mesh, sharded.flatten_rows(sig))

    keys, data, lens, total, ovf = sharded.batch_encode_sharded_pallas5(
        x, mesh=mesh, batch=b, block=BLOCK, slack=SLACK)
    assert int(np.asarray(ovf).sum()) == 0, "unexpected compact overflow"

    out = sharded.batch_decode_sharded_pallas5(
        keys, data, mesh=mesh, batch=b, block=BLOCK, slack=SLACK)

    # Round-trip asserted on device (scalar pull only — host pulls of the
    # full batch take minutes through the tunnel).
    mism = jax.jit(lambda a, b: jnp.sum(
        jnp.abs(a.astype(jnp.int32) - b.astype(jnp.int32))))
    m = int(mism(x, out)[None][0])
    assert m == 0, f"sharded round-trip mismatch on chip: {m}"

    nbytes = b * N * 2
    enc = measure(lambda: sharded.batch_encode_sharded_pallas5(
        x, mesh=mesh, batch=b, block=BLOCK, slack=SLACK)[1], nbytes)
    dec = measure(lambda: sharded.batch_decode_sharded_pallas5(
        keys, data, mesh=mesh, batch=b, block=BLOCK, slack=SLACK), nbytes)

    # Loose throughput floor: the retry-on-nonpositive-slope sampling above
    # means noise alone can't fail this check, so a silent 10x collapse
    # would otherwise pass. r3 measured enc 18.6 / dec 36.3 and chip
    # windows swing ~3x; 5 GB/s trips a real regression without flaking.
    floor = float(os.environ.get("VBZ_CHIP_FLOOR_GB_S", "5"))
    assert enc >= floor and dec >= floor, \
        f"sharded throughput below floor: enc {enc:.2f} / dec {dec:.2f} " \
        f"GB/s (floor {floor})"

    print(json.dumps({
        "sharded_pallas_chip": "ok",
        "devices": len(devices),
        "platform": devices[0].platform,
        "block": BLOCK,
        "enc_gb_s": round(enc, 3),
        "dec_gb_s": round(dec, 3),
    }))


if __name__ == "__main__":
    main()
