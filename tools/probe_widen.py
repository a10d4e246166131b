"""Micro-A/B: i32 fetch vs i8 fetch + widen, and widening variants.

Times three kernels that DMA a window per grid step and write it out:
  A: i32 HBM -> i32 stage -> out          (codec4 decode fetch path)
  B: i8 HBM -> i8 stage -> widen -> out   (codec5 decode fetch path)
  C: i8 HBM -> i8 stage -> u8-mask widen variant
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

import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
BLOCK = 32768
FW = BLOCK + 8192
NB = 128  # 4M values


def k_i32(data_ref, out_ref, stage, sem):
    k = pl.program_id(0)
    c = pltpu.make_async_copy(
        data_ref.at[pl.ds(pl.multiple_of(k * BLOCK, 1024), FW)], stage, sem)
    c.start(); c.wait()
    out_ref[:] = stage[:].reshape(FW // LANES, LANES)[:BLOCK // LANES]


def k_i8(data_ref, out_ref, stage, sem):
    k = pl.program_id(0)
    c = pltpu.make_async_copy(
        data_ref.at[pl.ds(pl.multiple_of(k * BLOCK, 4096), FW)], stage, sem)
    c.start(); c.wait()
    w = (stage[:].astype(jnp.int32) & 0xFF).reshape(FW // LANES, LANES)
    out_ref[:] = w[:BLOCK // LANES]


def k_i8_2d(data_ref, out_ref, stage, sem):
    # stage is 2-D i8; DMA a 2-D window (row-granular offsets)
    k = pl.program_id(0)
    c = pltpu.make_async_copy(
        data_ref.at[pl.ds(pl.multiple_of(k * BLOCK // LANES, 32),
                          FW // LANES)], stage, sem)
    c.start(); c.wait()
    w = stage[:].astype(jnp.int32) & 0xFF
    out_ref[:] = w[:BLOCK // LANES]


def run(name, kernel, data, stage_shape, stage_dtype, in_1d):
    try:
        f = pl.pallas_call(
            kernel,
            grid=(NB,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((BLOCK // LANES, LANES),
                                   lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(
                (NB * BLOCK // LANES, LANES), jnp.int32),
            scratch_shapes=[pltpu.VMEM(stage_shape, stage_dtype),
                            pltpu.SemaphoreType.DMA],
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )
        g = jax.jit(f)
        r = g(data)
        def fence(arr):
            return float(jnp.sum(arr.ravel()[:8])[None][0])
        fence(r)
        def passes(reps):
            t0 = time.perf_counter()
            last = None
            for _ in range(reps):
                last = g(data)
            fence(last)
            return time.perf_counter() - t0
        lo, hi = 4, 24
        s = sorted((passes(hi) - passes(lo)) / (hi - lo) for _ in range(3))[1]
        gbps = NB * BLOCK / s / 1e9
        print(f"{name}: {gbps:.1f} G bytes/s")
    except Exception as e:
        print(f"{name}: FAIL {type(e).__name__}: {str(e)[:200]}")


def main():
    n = NB * BLOCK + FW
    rng = np.random.default_rng(0)
    d32 = jnp.asarray(rng.integers(0, 256, n, np.int32))
    d8 = jnp.asarray(rng.integers(-128, 128, n, np.int8))
    d8_2d = jnp.asarray(rng.integers(-128, 128,
                                     (n // LANES, LANES), np.int8))
    run("A i32 fetch", k_i32, d32, (FW,), jnp.int32, True)
    run("B i8 fetch + widen (flat)", k_i8, d8, (FW,), jnp.int8, True)
    run("C i8 fetch + widen (2-D)", k_i8_2d, d8_2d,
        (FW // LANES, LANES), jnp.int8, False)


if __name__ == "__main__":
    main()
