"""Probe: 1-D int8 VMEM scratch + dynamic-offset DMA into an i8 HBM ref,
plus i32<->i8 casts and flat reshape on i8 — the pieces codec5 needs to
move the expanded data section at byte granularity."""

import sys

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
AG = 4096  # candidate i8 offset granularity


def _wr_kernel(x_ref, off_ref, out_ref, stage, sem):
    R = x_ref.shape[0]
    xb = x_ref[:].astype(jnp.int8)
    stage[:] = xb.reshape(R * LANES)
    off = off_ref[0]
    wa = pl.multiple_of(off, AG)
    copy = pltpu.make_async_copy(stage, out_ref.at[pl.ds(wa, R * LANES)], sem)
    copy.start()
    copy.wait()


def _rd_kernel(off_ref, data_ref, out_ref, stage, sem):
    R = out_ref.shape[0]
    off = off_ref[0]
    ra = pl.multiple_of(off, AG)
    copy = pltpu.make_async_copy(data_ref.at[pl.ds(ra, R * LANES)], stage, sem)
    copy.start()
    copy.wait()
    out_ref[:] = stage[:].reshape(R, LANES).astype(jnp.int32)


def main():
    print("devices:", jax.devices(), file=sys.stderr)
    R = 64
    rng = np.random.default_rng(0)
    x = rng.integers(-120, 120, (R, LANES), dtype=np.int32)

    try:
        out = pl.pallas_call(
            _wr_kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            out_shape=jax.ShapeDtypeStruct((65536,), jnp.int8),
            scratch_shapes=[pltpu.VMEM((R * LANES,), jnp.int8),
                            pltpu.SemaphoreType.DMA],
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(jnp.asarray(x), jnp.asarray(np.array([AG], np.int32)))
        got = np.asarray(out)[AG:AG + R * LANES]
        exp = x.astype(np.int8).reshape(-1)
        print("i8 write DMA:", "OK" if (got == exp).all() else "WRONG")
    except Exception as e:
        print(f"i8 write DMA: FAIL {type(e).__name__}: {str(e)[:300]}")
        return

    data = rng.integers(-128, 128, 65536, dtype=np.int8)
    try:
        out = pl.pallas_call(
            _rd_kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((R, LANES), jnp.int32),
            scratch_shapes=[pltpu.VMEM((R * LANES,), jnp.int8),
                            pltpu.SemaphoreType.DMA],
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(jnp.asarray(np.array([2 * AG], np.int32)), jnp.asarray(data))
        got = np.asarray(out).reshape(-1)
        exp = data[2 * AG:2 * AG + R * LANES].astype(np.int32)
        print("i8 read DMA:", "OK" if (got == exp).all() else "WRONG")
    except Exception as e:
        print(f"i8 read DMA: FAIL {type(e).__name__}: {str(e)[:300]}")


if __name__ == "__main__":
    main()
