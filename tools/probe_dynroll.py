"""Probe: dynamic-amount pltpu.roll / flat dynamic shift on hardware.

Questions:
  1. Does pltpu.roll(x, k, axis=1) lower when k is a traced scalar (i32)?
  2. Same for axis=0 (sublane roll)?
  3. Can we build a flat dynamic shift-right by a in [0, 1024) from them?
  4. Does an i32 matmul-via-f32 prefix sum inside a kernel work + match?
"""

import functools
import sys

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def _kernel_dynlane(x_ref, a_ref, o_ref):
    a = a_ref[0]
    o_ref[:] = pltpu.roll(x_ref[:], a, 1)


def _kernel_dynsub(x_ref, a_ref, o_ref):
    a = a_ref[0]
    o_ref[:] = pltpu.roll(x_ref[:], a, 0)


def _flat_dyn_shift_right(x, a):
    """Shift [R,128] right by a slots flat-row-major, zero fill; a traced."""
    R = x.shape[0]
    rows = a // LANES
    lanes = a % LANES
    # row shift by dynamic amount: roll axis 0 then mask
    ridx = jax.lax.broadcasted_iota(jnp.int32, (R, LANES), 0)
    xr = pltpu.roll(x, rows, 0)
    xr = jnp.where(ridx >= rows, xr, 0)
    # lane shift with cross-row carry
    same = pltpu.roll(xr, lanes, 1)
    prev = pltpu.roll(xr, 1, 0)
    prev = jnp.where(ridx >= 1, prev, 0)
    prev = pltpu.roll(prev, lanes, 1)
    lidx = jax.lax.broadcasted_iota(jnp.int32, (R, LANES), 1)
    return jnp.where(lidx >= lanes, same, prev)


def _kernel_flatdyn(x_ref, a_ref, o_ref):
    o_ref[:] = _flat_dyn_shift_right(x_ref[:], a_ref[0])


def _kernel_mxu_psum(x_ref, o_ref):
    R = x_ref.shape[0]
    x = x_ref[:].astype(jnp.float32)
    tri = (jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 0)
           <= jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 1)
           ).astype(jnp.float32)
    lane_ps = jax.lax.dot_general(
        x, tri, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    ps = lane_ps.astype(jnp.int32)
    # cross-row: log2(R) stages of row shift+add
    rt = jnp.broadcast_to(ps[:, LANES - 1:LANES], (R, LANES))
    shift = 1
    while shift < R:
        ridx = jax.lax.broadcasted_iota(jnp.int32, (R, LANES), 0)
        rs = pltpu.roll(rt, shift, 0)
        rt = rt + jnp.where(ridx >= shift, rs, 0)
        shift <<= 1
    # rt now holds inclusive row-total prefix; exclusive = rt - own row total
    own = jnp.broadcast_to(ps[:, LANES - 1:LANES], (R, LANES))
    o_ref[:] = ps + rt - own


def run(name, kernel, args, out_shape):
    try:
        f = pl.pallas_call(
            kernel,
            out_shape=out_shape,
        )
        r = jax.jit(f)(*args)
        r = np.asarray(r)
        return r
    except Exception as e:
        print(f"{name}: FAIL {type(e).__name__}: {str(e)[:300]}",
              file=sys.stderr)
        return None


def main():
    print("devices:", jax.devices(), file=sys.stderr)
    R = 16
    x = np.arange(R * LANES, dtype=np.int32).reshape(R, LANES)
    a = np.array([5], dtype=np.int32)

    r = run("dyn lane roll", _kernel_dynlane,
            (jnp.asarray(x), jnp.asarray(a)),
            jax.ShapeDtypeStruct((R, LANES), jnp.int32))
    if r is not None:
        exp = np.roll(x, 5, axis=1)
        print("dyn lane roll:", "OK" if (r == exp).all() else "WRONG")

    r = run("dyn sublane roll", _kernel_dynsub,
            (jnp.asarray(x), jnp.asarray(a)),
            jax.ShapeDtypeStruct((R, LANES), jnp.int32))
    if r is not None:
        exp = np.roll(x, 5, axis=0)
        print("dyn sublane roll:", "OK" if (r == exp).all() else "WRONG")

    for amt in (0, 1, 127, 128, 129, 1023):
        a = np.array([amt], dtype=np.int32)
        r = run(f"flat dyn shift {amt}", _kernel_flatdyn,
                (jnp.asarray(x), jnp.asarray(a)),
                jax.ShapeDtypeStruct((R, LANES), jnp.int32))
        if r is not None:
            flat = x.reshape(-1)
            exp = np.concatenate(
                [np.zeros(amt, np.int32), flat[:len(flat) - amt]]
            ).reshape(R, LANES)
            print(f"flat dyn shift {amt}:",
                  "OK" if (r == exp).all() else "WRONG")

    xr = np.random.default_rng(0).integers(0, 2, (256, LANES),
                                           dtype=np.int32)
    r = run("mxu psum", _kernel_mxu_psum, (jnp.asarray(xr),),
            jax.ShapeDtypeStruct((256, LANES), jnp.int32))
    if r is not None:
        exp = np.cumsum(xr.reshape(-1)).reshape(256, LANES)
        print("mxu psum:", "OK" if (r == exp).all() else "WRONG")


if __name__ == "__main__":
    main()
