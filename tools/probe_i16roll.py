"""Probe: do STATIC-amount rolls + selects lower on int16 arrays?

ROADMAP records the lanes16 negative for ``tpu.dynamic_rotate`` on i16
("Rotate with non-32-bit data: not implemented") — but the codec's butterfly
stages use STATIC shift amounts (``pltpu.roll(x, k, axis)`` with python-int
k). If static i16 rolls lower, the decode's forward displacement route
(tokens <= 13 bits on the compact path) can run at i16 width — VPU packs
two i16 per 32-bit lane slot, so elementwise throughput doubles.

Also times a 10-stage i16 vs i32 butterfly-shaped loop to verify the width
actually buys throughput, not just compiles.
"""

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

LANES = 128
R = 528  # the decode replay's working-array row count at block 64K


def _shift_right(x, k):
    rows, lanes = k // LANES, k % LANES
    if rows:
        x = jnp.concatenate(
            [jnp.zeros((rows, LANES), x.dtype), x[:x.shape[0] - rows]],
            axis=0)
    if lanes == 0:
        return x
    same = pltpu.roll(x, lanes, 1)
    prev = jnp.concatenate(
        [jnp.zeros((1, LANES), x.dtype), x[: x.shape[0] - 1]], axis=0)
    prev = pltpu.roll(prev, lanes, 1)
    lidx = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return jnp.where(lidx >= lanes, same, prev)


def kernel_factory(dtype, stages):
    def kern(x_ref, o_ref):
        chan = x_ref[:]
        for j in range(stages - 1, -1, -1):
            rolled = _shift_right(chan, 1 << j)
            bit_rolled = (rolled >> (1 + j)) & 1
            bit_stay = (chan >> (1 + j)) & 1
            chan = jnp.where(bit_rolled == 1, rolled,
                             jnp.where(bit_stay == 0, chan, 0))
        o_ref[:] = chan

    return kern


def fence(arr):
    return float(jnp.sum(arr.astype(jnp.int32).ravel()[:8])[None][0])


def run(dtype_name, dtype, stages=10, grid=64):
    x = np.zeros((R, LANES), dtype=dtype_name)
    # tokens: occupancy bit 0, displacement bits 1..12 (fits both widths)
    rng = np.random.default_rng(0)
    E = np.sort(rng.integers(0, 600, R * LANES)).reshape(R, LANES)
    x[:] = ((E << 1) | 1).astype(dtype_name)

    f = pl.pallas_call(
        kernel_factory(dtype, stages),
        grid=(grid,),
        in_specs=[pl.BlockSpec((R, LANES), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((R, LANES), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R, LANES), dtype),
    )
    xj = jax.device_put(jnp.asarray(x))
    jf = jax.jit(f)
    try:
        out = jf(xj)
        fence(out)
    except Exception as exc:
        print(f"{dtype_name}: FAILS — {type(exc).__name__}: "
              f"{str(exc)[:300]}")
        return None

    def passes(r):
        t0 = time.perf_counter()
        last = None
        for _ in range(r):
            last = jf(xj)
        fence(last)
        return time.perf_counter() - t0

    passes(1)
    r_lo, r_hi = 4, 24
    s = sorted((passes(r_hi) - passes(r_lo)) / (r_hi - r_lo)
               for _ in range(3))[1]
    per_stage_us = s / (grid * stages) * 1e6
    print(f"{dtype_name}: ok, {per_stage_us:.2f} us/stage "
          f"({grid} grid x {stages} stages, total {s*1e3:.2f} ms/call)")
    return np.asarray(out), per_stage_us


def main():
    r32 = run("int32", jnp.int32)
    r16 = run("int16", jnp.int16)
    if r32 is not None and r16 is not None:
        same = np.array_equal(r32[0].astype(np.int32),
                              r16[0].astype(np.int32))
        print(f"results match: {same}; "
              f"i16 speedup {r32[1] / r16[1]:.2f}x")


if __name__ == "__main__":
    main()
