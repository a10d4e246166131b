"""Honest device-capability probe for the axon-tunneled TPU.

block_until_ready returns early on this backend and host pulls cost a
0.1-0.35 s RPC, so every op is timed by the slope method: queue R async
calls (device executes FIFO), fence only the last via a tiny scalar pull,
and difference two values of R.
"""

import time

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def fence(arr):
    return float(jnp.sum(arr.astype(jnp.float32).ravel()[:4])[None][0])


def slope(call, r_lo=2, r_hi=10):
    def run(r):
        t0 = time.perf_counter()
        last = None
        for i in range(r):
            last = call(i)
        fence(last)
        return time.perf_counter() - t0

    call(0)
    run(1)  # warm compiles + fence
    return (run(r_hi) - run(r_lo)) / (r_hi - r_lo)


def main():
    rng = np.random.default_rng(0)

    # elementwise 8 MiB int16
    xs = [jax.device_put(jnp.asarray(
        rng.integers(-3000, 3000, 4 * 1024 * 1024, dtype=np.int16)))
        for _ in range(2)]
    f_add = jax.jit(lambda x: x + 1)
    t = slope(lambda i: f_add(xs[i % 2]))
    print(f"elementwise add 8MB i16: {t*1e3:.2f} ms  ({8/1024/t:.1f} GB/s rw)")

    # f32 elementwise 32 MiB
    ys = [jax.device_put(jnp.asarray(rng.normal(size=8 * 1024 * 1024)
                                     .astype(np.float32))) for _ in range(2)]
    f_mul = jax.jit(lambda x: x * 1.5 + 2.0)
    t = slope(lambda i: f_mul(ys[i % 2]))
    print(f"elementwise fma 32MB f32: {t*1e3:.2f} ms  ({32/1024/t:.1f} GB/s rw)")

    # matmul 2048^3 bf16
    a = jax.device_put(jnp.asarray(
        rng.normal(size=(2048, 2048)).astype(np.float32)).astype(jnp.bfloat16))
    b = jax.device_put(jnp.asarray(
        rng.normal(size=(2048, 2048)).astype(np.float32)).astype(jnp.bfloat16))
    f_mm = jax.jit(lambda a, b, s: (a + s) @ b)
    t = slope(lambda i: f_mm(a, b, jnp.bfloat16(i % 2)))
    flops = 2 * 2048**3
    print(f"matmul 2048^3 bf16: {t*1e3:.2f} ms  ({flops/t/1e12:.1f} TFLOP/s)")

    # gathers: 8M indices from small (64KB) vs big (16MB) tables
    for tab_n, tag in ((16384, "64KB"), (4 * 1024 * 1024, "16MB")):
        tab = jax.device_put(jnp.asarray(
            rng.integers(0, 1000, tab_n, dtype=np.int32)))
        idx = [jax.device_put(jnp.asarray(
            rng.integers(0, tab_n, 8 * 1024 * 1024, dtype=np.int32)))
            for _ in range(2)]
        f_g = jax.jit(lambda t_, i_: t_[i_])
        t = slope(lambda i: f_g(tab, idx[i % 2]))
        print(f"gather 8M from {tag}: {t*1e3:.2f} ms  ({8e6/t/1e6/1e3:.2f} G/s)")

    # monotone gather (sequential-ish indices)
    tab = jax.device_put(jnp.asarray(
        rng.integers(0, 1000, 4 * 1024 * 1024, dtype=np.int32)))
    midx = [jax.device_put(jnp.asarray(np.minimum(
        np.arange(8 * 1024 * 1024, dtype=np.int32) // 2 + k,
        4 * 1024 * 1024 - 1))) for k in range(2)]
    f_g = jax.jit(lambda t_, i_: t_[i_])
    t = slope(lambda i: f_g(tab, midx[i % 2]))
    print(f"monotone gather 8M from 16MB: {t*1e3:.2f} ms ({8e6/t/1e9:.2f} G/s)")

    # cumsum dtypes
    for dt, tag in ((np.int32, "i32"), (np.uint16, "u16"), (np.float32, "f32")):
        zs = [jax.device_put(jnp.asarray(
            rng.integers(0, 3, 4 * 1024 * 1024).astype(dt))) for _ in range(2)]
        f_c = jax.jit(lambda x: jnp.cumsum(x))
        t = slope(lambda i: f_c(zs[i % 2]))
        print(f"cumsum 4M {tag}: {t*1e3:.2f} ms")

    # reduction
    f_s = jax.jit(lambda x: jnp.sum(x))
    t = slope(lambda i: f_s(ys[i % 2]))
    print(f"sum 32MB f32: {t*1e3:.2f} ms ({32/1024/t:.1f} GB/s)")


if __name__ == "__main__":
    main()
