"""Probe: in-kernel key pack/unpack via bf16 MXU matmuls + (R,128)<->(R/4,512)
flat reshapes, on hardware."""

import sys

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def _pack_kernel(c_ref, k_ref):
    RV = c_ref.shape[0]
    c = c_ref[:]
    lidx = jax.lax.broadcasted_iota(jnp.int32, (RV, LANES), 1)
    wc = c << (2 * (lidx & 3))
    A = wc.reshape(RV // 4, 512).astype(jnp.bfloat16)
    j = jax.lax.broadcasted_iota(jnp.int32, (512, LANES), 0)
    l = jax.lax.broadcasted_iota(jnp.int32, (512, LANES), 1)
    G = (j // 4 == l).astype(jnp.bfloat16)
    K = jax.lax.dot_general(A, G, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    k_ref[:] = K.astype(jnp.int32).astype(jnp.uint8)


def _unpack_kernel(k_ref, c_ref):
    KR = k_ref.shape[0]
    kb = k_ref[:].astype(jnp.int32).astype(jnp.bfloat16)
    li = jax.lax.broadcasted_iota(jnp.int32, (LANES, 512), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (LANES, 512), 1)
    R = (li == j // 4).astype(jnp.bfloat16)
    Krep = jax.lax.dot_general(kb, R, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
    Krep = Krep.astype(jnp.int32)
    jj = jax.lax.broadcasted_iota(jnp.int32, (KR, 512), 1)
    codes = (Krep >> (2 * (jj & 3))) & 3
    c_ref[:] = codes.reshape(KR * 4, LANES)


def main():
    print("devices:", jax.devices(), file=sys.stderr)
    RV = 256
    rng = np.random.default_rng(0)
    c = rng.integers(0, 2, (RV, LANES), dtype=np.int32)

    try:
        k = pl.pallas_call(
            _pack_kernel,
            out_shape=jax.ShapeDtypeStruct((RV // 4, LANES), jnp.uint8),
        )(jnp.asarray(c))
        k = np.asarray(k)
        cf = c.reshape(-1, 4)
        exp = (cf[:, 0] | (cf[:, 1] << 2) | (cf[:, 2] << 4)
               | (cf[:, 3] << 6)).astype(np.uint8).reshape(RV // 4, LANES)
        print("pack:", "OK" if (k == exp).all() else "WRONG")
    except Exception as e:
        print(f"pack: FAIL {type(e).__name__}: {str(e)[:400]}")

    keys = rng.integers(0, 256, (RV // 4, LANES), dtype=np.uint8)
    try:
        co = pl.pallas_call(
            _unpack_kernel,
            out_shape=jax.ShapeDtypeStruct((RV, LANES), jnp.int32),
        )(jnp.asarray(keys))
        co = np.asarray(co)
        kf = keys.reshape(-1)
        exp = np.stack([(kf >> (2 * m)) & 3 for m in range(4)],
                       axis=1).reshape(RV, LANES).astype(np.int32)
        print("unpack:", "OK" if (co == exp).all() else "WRONG")
    except Exception as e:
        print(f"unpack: FAIL {type(e).__name__}: {str(e)[:400]}")


if __name__ == "__main__":
    main()
