"""Pallas TPU codec kernels, v4 — alignment-split routing (W2 hot path).

Changes vs :mod:`.pallas_codec3` (measured on the int16 signal bench):

- **DMA misalignment is NOT fused into routing displacements.** codec3
  routes every value to ``E(i) + a`` (``a = offset % 1024``), which forces
  ``dmax >= a`` — typically ~10 active butterfly stages per block even when
  the block is perfectly compressible (``e_last ~ 0`` on nanopore-like
  signal). v4 routes with ``d = E(i)`` only, so the data-adaptive stage
  skipping collapses to ``ceil(log2(e_last))`` stages, and the staged bytes
  are aligned afterwards by ONE uniform flat dynamic shift built from
  dynamic-amount ``pltpu.roll`` (probed supported on i32, both axes,
  2026-08-20 — ``tools/probe_dynroll.py``).
- **Dynamic rotates replace the select ladders.** The carry-tail extraction
  (a ``log2(SR*LANES)``-stage conditional shift ladder in codec3) becomes a
  single dynamic sublane roll (the shift is always a multiple of 1024 =
  8 rows).
- **Key bytes are produced and consumed IN-KERNEL.** codec3 computes the
  key section with a separate XLA pass whose ``(N/4, 4)`` reshape forces a
  layout-hostile relayout on TPU — measured at ~86% of total encode time
  (tools/ab_enc_attrib.py: 4.4 GB/s with the pass, 31.9 GB/s without).
  v4 packs 4 codes/byte with one bf16 MXU matmul (exact: all integers
  <= 256) inside the encode kernel, and expands key bytes back to codes
  inside the decode kernel the same way; no XLA pass touches the input or
  key stream at all.

Wire format and outputs are IDENTICAL to codec3's ``encode_w2``/
``decode_w2`` (same expanded-i32 data section, same key bytes), mirroring
the reference hot loop ``vbz/v0/vbz_streamvbyte_impl_sse3.h:406-540``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_codec2 import (
    ALIGN,
    ALIGN_ROWS,
    LANES,
    _flat_prefix_sum_incl,
    _flat_shift_left,
    _flat_shift_right,
)
from .pallas_codec3 import (
    A_GRAN,
    D_SHIFT,
    OCC_BIT,
    W2_FLAVORS,
    _INPUT_DTYPE,
    _codes_w2,
    _fwd_transform,
    _last_slot,
    _route_msb,
    _route_msb_masks,
    _reverse_replay,
    block_offsets_from_keys,
)

__all__ = [
    "encode_w2",
    "decode_w2",
    "block_offsets_from_keys",
]


def block_offsets_from_keys_flat(keys: jax.Array, block: int) -> jax.Array:
    """Per-block data-section byte offsets for W2 streams, computed WITHOUT
    the layout-hostile ``(N/4, 4)`` reshape (flat elementwise + reduction).
    Valid for well-formed W2 keys (codes 0/1)."""
    kb = keys.astype(jnp.int32)
    extra = (((kb & 3) != 0).astype(jnp.int32)
             + (((kb >> 2) & 3) != 0).astype(jnp.int32)
             + (((kb >> 4) & 3) != 0).astype(jnp.int32)
             + (((kb >> 6) & 3) != 0).astype(jnp.int32))
    bsum = block + extra.reshape(-1, block // 4).sum(axis=1)
    return (jnp.cumsum(bsum) - bsum).astype(jnp.int32)


def _flat_dyn_shift_right(x: jax.Array, a) -> jax.Array:
    """Shift [R,128] right by a traced ``a`` slots (flat row-major order),
    zero-filling; requires ``0 <= a < R*128``."""
    R = x.shape[0]
    rows = a // LANES
    lanes = a % LANES
    ridx = jax.lax.broadcasted_iota(jnp.int32, (R, LANES), 0)
    lidx = jax.lax.broadcasted_iota(jnp.int32, (R, LANES), 1)
    xr = pltpu.roll(x, rows, 0)
    xr = jnp.where(ridx >= rows, xr, 0)
    same = pltpu.roll(xr, lanes, 1)
    prev = pltpu.roll(xr, 1, 0)
    prev = jnp.where(ridx >= 1, prev, 0)
    prev = pltpu.roll(prev, lanes, 1)
    return jnp.where(lidx >= lanes, same, prev)


def _flat_dyn_shift_left(x: jax.Array, a) -> jax.Array:
    """Shift [R,128] left by a traced ``a`` slots (flat row-major order),
    zero-filling; requires ``0 <= a < R*128``."""
    R = x.shape[0]
    rows = a // LANES
    lanes = a % LANES
    ridx = jax.lax.broadcasted_iota(jnp.int32, (R, LANES), 0)
    lidx = jax.lax.broadcasted_iota(jnp.int32, (R, LANES), 1)
    xr = pltpu.roll(x, (R - rows) % R, 0)
    xr = jnp.where(ridx < R - rows, xr, 0)
    same = pltpu.roll(xr, (LANES - lanes) % LANES, 1)
    nxt = pltpu.roll(xr, R - 1, 0)
    nxt = jnp.where(ridx < R - 1, nxt, 0)
    nxt = pltpu.roll(nxt, (LANES - lanes) % LANES, 1)
    return jnp.where(lidx < LANES - lanes, same, nxt)


def _row_dyn_shift_left(x: jax.Array, a) -> jax.Array:
    """Flat left shift by ``a`` slots when ``a`` is a multiple of LANES
    (pure dynamic sublane roll + mask)."""
    R = x.shape[0]
    rows = a // LANES
    ridx = jax.lax.broadcasted_iota(jnp.int32, (R, LANES), 0)
    xr = pltpu.roll(x, (R - rows) % R, 0)
    return jnp.where(ridx < R - rows, xr, 0)




def _pack_keys_mxu(c: jax.Array) -> jax.Array:
    """Pack per-value 2-bit codes [RV,128] into key bytes [RV//4,128] with a
    bf16 MXU matmul (exact: operands and sums are integers <= 256)."""
    RV = c.shape[0]
    lidx = jax.lax.broadcasted_iota(jnp.int32, (RV, LANES), 1)
    wc = (c << (2 * (lidx & 3))).reshape(RV // 4, 4 * LANES)
    j = jax.lax.broadcasted_iota(jnp.int32, (4 * LANES, LANES), 0)
    l = jax.lax.broadcasted_iota(jnp.int32, (4 * LANES, LANES), 1)
    G = (j // 4 == l).astype(jnp.bfloat16)
    K = jax.lax.dot_general(wc.astype(jnp.bfloat16), G,
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    return K.astype(jnp.int32)


def _unpack_keys_mxu(kb: jax.Array) -> jax.Array:
    """Expand key bytes [KR,128] (any int dtype) to per-value 2-bit codes
    [KR*4,128] via a bf16 MXU replicate-matmul (exact <= 256)."""
    KR = kb.shape[0]
    kf = kb.astype(jnp.int32).astype(jnp.bfloat16)
    li = jax.lax.broadcasted_iota(jnp.int32, (LANES, 4 * LANES), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (LANES, 4 * LANES), 1)
    R = (li == j // 4).astype(jnp.bfloat16)
    Krep = jax.lax.dot_general(kf, R, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
    Krep = Krep.astype(jnp.int32)
    jj = jax.lax.broadcasted_iota(jnp.int32, (KR, 4 * LANES), 1)
    codes = (Krep >> (2 * (jj & 3))) & 3
    return codes.reshape(KR * 4, LANES)




# ---------------------------------------------------------------------------
# Encode
# ---------------------------------------------------------------------------


def _encode_kernel_factory(d_bits: int, flavor: str, slack: int):
    def _encode_block_kernel(x_ref, keys_ref, data_ref, total_ref, state_ref,
                             carry_ref, stage_ref, sem):
        RV, _ = x_ref.shape                  # (V//128, 128)
        V = RV * LANES
        ext_rows = slack // LANES + ALIGN_ROWS
        k = pl.program_id(0)
        nblocks = pl.num_programs(0)

        @pl.when(k == 0)
        def _():
            state_ref[0] = 0                 # running output byte offset
            state_ref[1] = 0                 # previous sample
            total_ref[1] = 0                 # overflow flag
            carry_ref[:] = jnp.zeros((ALIGN_ROWS, LANES), jnp.int32)

        xi = x_ref[:].astype(jnp.int32)
        if flavor == "zz16":
            xi = xi & 0xFFFF
        v, prev_out = _fwd_transform(flavor, xi, state_ref[1])
        state_ref[1] = prev_out

        c = _codes_w2(v)
        keys_ref[:] = _pack_keys_mxu(c).astype(jnp.uint8)
        # One cheap reduction decides the whole block's shape: e_sum is the
        # extra-byte count (== the prefix sum's last slot, computed without
        # the prefix sum).
        e_sum = jnp.sum(c)
        block_len = jnp.minimum(V + e_sum, V + slack)
        total_ref[1] = total_ref[1] | (e_sum > slack).astype(jnp.int32)

        off = state_ref[0]
        a = off & (A_GRAN - 1)
        SR = RV + ext_rows

        # Route each value's u16 payload to slot i + E(i). Unlike codec3 the
        # DMA misalignment is NOT part of the displacement, so dmax is the
        # block's true extra-byte count — ~0 on compressible signal. A block
        # with NO extra bytes (every v < 256, the common signal case) skips
        # the prefix sum and the whole routing network with one real branch.
        def _routed_bytes(v):
            E = _flat_prefix_sum_incl(c) - c
            chan = v | (1 << OCC_BIT) | (E << D_SHIFT)
            chan = jnp.concatenate(
                [chan, jnp.zeros((ext_rows, LANES), jnp.int32)], axis=0)
            (routed,) = _route_msb(chan, d_bits, dmax=e_sum)
            # byte[q] = lo byte landed at q | hi byte of the value at q-1.
            return (routed & 0xFF) | \
                ((_flat_shift_right(routed, 1) >> 8) & 0xFF)

        def _trivial_bytes(v):
            return jnp.concatenate(
                [v, jnp.zeros((ext_rows, LANES), jnp.int32)], axis=0)

        data_bytes = jax.lax.cond(e_sum > 0, _routed_bytes, _trivial_bytes, v)

        # Align: one uniform dynamic shift instead of +a displacements.
        data_bytes = _flat_dyn_shift_right(data_bytes, a)

        carry_ext = jnp.concatenate(
            [carry_ref[:], jnp.zeros((SR - ALIGN_ROWS, LANES), jnp.int32)],
            axis=0)
        staged = data_bytes | carry_ext

        # Deferred-wait DMA (see codec3): wait for the previous block's copy
        # only now, just before overwriting the staging buffer.
        @pl.when(k != 0)
        def _():
            pltpu.make_async_copy(
                stage_ref, data_ref.at[pl.ds(0, SR * LANES)], sem).wait()
        stage_ref[:] = staged.reshape(SR * LANES)

        wa = pl.multiple_of(off - a, A_GRAN)
        copy = pltpu.make_async_copy(
            stage_ref, data_ref.at[pl.ds(wa, SR * LANES)], sem)
        copy.start()

        @pl.when(k == nblocks - 1)
        def _():
            copy.wait()

        new_off = off + block_len
        # Carry tail: the staged bytes from the new offset's ALIGN-floor on.
        # tail_rel is always a multiple of A_GRAN = 8 rows → pure row roll.
        tail_rel = (new_off & ~(A_GRAN - 1)) - (off - a)
        tail = _row_dyn_shift_left(staged, tail_rel)
        na = new_off & (A_GRAN - 1)
        cidx = jax.lax.broadcasted_iota(
            jnp.int32, (ALIGN_ROWS, LANES), 0) * LANES + \
            jax.lax.broadcasted_iota(jnp.int32, (ALIGN_ROWS, LANES), 1)
        carry_ref[:] = jnp.where(cidx < na, tail[:ALIGN_ROWS], 0)

        state_ref[0] = new_off

        @pl.when(k == nblocks - 1)
        def _():
            total_ref[0] = new_off

    return _encode_block_kernel


@functools.partial(jax.jit, static_argnames=("block", "flavor", "slack"))
def encode_w2(x: jax.Array, block: int = 32768, flavor: str = "zz16",
              slack: int = 2048):
    """Fused transform + StreamVByte v0 pack, alignment-split routing.

    Same contract as ``pallas_codec3.encode_w2(..., slack=slack)``:
    returns ``(key_bytes u8 [N//4], data_expanded i32, data_len,
    overflow)``. Blocks with more than ``slack`` extra bytes set the
    overflow flag; re-encode those inputs with the codec3 general kernel.
    """
    assert flavor in W2_FLAVORS
    N = x.shape[0]
    assert x.dtype == _INPUT_DTYPE[flavor]
    assert N % block == 0 and block % 512 == 0
    assert slack % LANES == 0 and 0 < slack <= block
    d_bits = max(slack.bit_length(), 1)
    assert D_SHIFT + d_bits <= 32
    nblocks = N // block
    RV = block // LANES
    ext = slack
    out_len = N + nblocks * ext + block + ext + 2 * ALIGN

    x2 = x.reshape(N // LANES, LANES)
    KR = RV // 4

    keys, data_x, total = pl.pallas_call(
        _encode_kernel_factory(d_bits, flavor, slack),
        grid=(nblocks,),
        in_specs=[pl.BlockSpec((RV, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec((KR, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((N // 512, LANES), jnp.uint8),
            jax.ShapeDtypeStruct((out_len,), jnp.int32),
            jax.ShapeDtypeStruct((2,), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.SMEM((2,), jnp.int32),
            pltpu.VMEM((ALIGN_ROWS, LANES), jnp.int32),
            pltpu.VMEM((block + ext + ALIGN,), jnp.int32),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(x2)
    return keys.reshape(N // 4), data_x, total[0], total[1]


# ---------------------------------------------------------------------------
# Decode
# ---------------------------------------------------------------------------


def _decode_kernel_factory(d_bits: int, flavor: str, slack: int):
    def _decode_block_kernel(keys_ref, boff_ref, data_ref, out_ref, state_ref,
                             stage_a, stage_b, sem_a, sem_b):
        RV = keys_ref.shape[0] * 4
        V = RV * LANES
        ext = slack
        k = pl.program_id(0)
        nblocks = pl.num_programs(0)

        @pl.when(k == 0)
        def _():
            state_ref[0] = 0

        # Hi-byte flags straight from the key bytes (bf16 MXU expansion).
        c = (_unpack_keys_mxu(keys_ref[:]) != 0).astype(jnp.int32)
        e_sum = jnp.sum(c)                   # block's extra-byte count

        # Two-buffer prefetch (see codec3).
        FW = V + ext + ALIGN

        def _start_fetch(step, stage, sem):
            bo_s = boff_ref[step]
            ra_s = pl.multiple_of(bo_s - (bo_s & (A_GRAN - 1)), A_GRAN)
            pltpu.make_async_copy(
                data_ref.at[pl.ds(ra_s, FW)], stage, sem).start()

        even = k % 2 == 0

        @pl.when(k == 0)
        def _():
            _start_fetch(k, stage_a, sem_a)

        @pl.when((k + 1 < nblocks) & even)
        def _():
            _start_fetch(k + 1, stage_b, sem_b)

        @pl.when((k + 1 < nblocks) & jnp.logical_not(even))
        def _():
            _start_fetch(k + 1, stage_a, sem_a)

        bo = boff_ref[k]
        a = bo & (A_GRAN - 1)

        def _take(stage, sem):
            pltpu.make_async_copy(
                data_ref.at[pl.ds(0, FW)], stage, sem).wait()
            return stage[:]

        ext_rows = ext // LANES + ALIGN_ROWS
        fetched = jax.lax.cond(
            even,
            lambda: _take(stage_a, sem_a),
            lambda: _take(stage_b, sem_b),
        ).reshape(RV + ext_rows, LANES)

        # Un-align with one uniform dynamic shift, then replay the routing
        # with the true displacements E (dmax = e_sum, stages mostly skip; a
        # block with NO extra bytes skips the prefix sum and the whole
        # simulate+replay machinery with one real branch).
        fetched = _flat_dyn_shift_left(fetched, a)
        w = (fetched & 0xFF) | \
            ((_flat_shift_left(fetched, 1) & 0xFF) << 8)

        def _replayed(w):
            E = _flat_prefix_sum_incl(c) - c
            zeros_rest = jnp.zeros((ext_rows, LANES), jnp.int32)
            occupied = jnp.concatenate(
                [jnp.ones((RV, LANES), jnp.int32), zeros_rest], axis=0)
            d = jnp.concatenate([E, zeros_rest], axis=0)
            [w16] = _reverse_replay(
                [w], _route_msb_masks(d, occupied, d_bits, dmax=e_sum),
                dmax=e_sum)
            return w16[:RV]

        w16 = jax.lax.cond(e_sum > 0, _replayed, lambda w: w[:RV], w)
        vals = (w16 & 0xFF) | (((w16 >> 8) & 0xFF) * c << 8)

        # Inverse transform.
        u = jax.lax.bitcast_convert_type(vals, jnp.uint32)
        neg = jnp.uint32(0) - (u & 1)
        if flavor == "zz16":
            delta = jax.lax.bitcast_convert_type(
                ((u >> 1) ^ neg) & 0xFFFF, jnp.int32)
            acc = _flat_prefix_sum_incl(delta) + state_ref[0]
            out16 = acc & 0xFFFF
            out_ref[:] = out16.astype(jnp.uint16).astype(jnp.int16)
            state_ref[0] = _last_slot(out16)
        else:  # zz8: 32-bit deltas, narrowing cast on output
            delta = jax.lax.bitcast_convert_type((u >> 1) ^ neg,
                                                 jnp.int32)
            acc = _flat_prefix_sum_incl(delta) + state_ref[0]
            out_ref[:] = (acc & 0xFF).astype(jnp.uint8).astype(jnp.int8)
            state_ref[0] = _last_slot(acc)

    return _decode_block_kernel


@functools.partial(jax.jit, static_argnames=("block", "flavor", "slack"))
def decode_w2(keys: jax.Array, data_expanded: jax.Array,
              block_offsets: jax.Array, block: int = 32768,
              flavor: str = "zz16", slack: int = 2048):
    """Inverse of :func:`encode_w2`. Same contract as codec3's compact
    ``decode_w2``: the CALLER must have verified from the keys that every
    block's data section fits ``block + slack`` bytes."""
    assert flavor in W2_FLAVORS
    N = keys.shape[0] * 4
    assert N % block == 0 and block % 512 == 0
    assert slack % LANES == 0 and 0 < slack <= block
    d_bits = max(slack.bit_length(), 1)
    nblocks = N // block
    RV = block // LANES
    ext = slack

    need = N + nblocks * ext + block + ext + 2 * ALIGN
    data_expanded = data_expanded.astype(jnp.int32)
    if data_expanded.shape[0] < need:
        data_expanded = jnp.concatenate(
            [data_expanded,
             jnp.zeros(need - data_expanded.shape[0], jnp.int32)])

    keys2 = keys.reshape(N // 512, LANES)
    KR = RV // 4

    out = pl.pallas_call(
        _decode_kernel_factory(d_bits, flavor, slack),
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((KR, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((RV, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (N // LANES, LANES), _INPUT_DTYPE[flavor]),
        scratch_shapes=[
            pltpu.SMEM((1,), jnp.int32),
            pltpu.VMEM((block + ext + ALIGN,), jnp.int32),
            pltpu.VMEM((block + ext + ALIGN,), jnp.int32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(keys2, block_offsets.astype(jnp.int32), data_expanded)
    return out.reshape(N)
