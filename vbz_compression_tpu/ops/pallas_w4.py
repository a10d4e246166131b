"""Deletion-compaction kernels for the 4-byte-code W4 flavors.

The W4 wire format (codes 0..3 -> 1..4 data bytes per value: zz32,
none32, none16, none8) ran on the first-generation codec3 kernels
(i32 data plane, block <= 8192, 1.3-4 GB/s). This module brings W4 onto
the round-5 deletion-compaction plane (see pallas_dense / pallas_v1):

- every value gets FOUR byte slots; code c keeps the first c + 1 and
  deletes the rest — every survivor of value i shares one leftward
  displacement D(i) = #deleted-before (nondecreasing, strictly
  increasing targets: the proven collision-free LSB-first push);
- byte tokens (8 payload bits + D <= 16 bits at block 16384) ride one
  i32 channel; stage groups range-gated on the deleted count;
- the 4-way interleave is four exact bf16 MXU matmuls; value reassembly
  is TWO matmuls (lo16 with {1,256} weights, hi16 likewise — one matmul
  would need 256^3 weights whose f32 sums exceed 2^24);
- the 32-bit un-delta prefix sum runs as four byte-plane MXU lane psums
  recombined with shifts (i32 wrap mod 2^32 is exactly the required
  semantics) plus the shared cross-row ladder.

Wire output is identical to the codec3 W4 kernels / scalar oracle.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_codec2 import LANES
from .pallas_codec3 import (
    W4_FLAVORS,
    _INPUT_DTYPE,
    _codes_w4,
    _fwd_transform,
    _last_slot,
)
from .pallas_codec4 import (
    _flat_dyn_shift_left,
    _flat_dyn_shift_right,
    _pack_keys_mxu,
    _row_dyn_shift_left,
    _unpack_keys_mxu,
)
from .pallas_codec5 import (
    AG,
    AG_ROWS,
    _cross_row_psum,
    _ext_bytes,
    _lane_psum_mxu,
)
from .pallas_dense import _dot_i32, _pull_msb_right, _route_lsb_left
from .pallas_v1 import _interleave4

__all__ = ["encode_w4_dense", "decode_w4_dense",
           "byte_offsets_from_keys_w4"]

D_SHIFT_W4 = 8  # token: byte bits [0,8), D bits [8, 8+17)


def _assemble_mats():
    """Two (512, 128) matrices summing bytes 0..1 and 2..3 of each value
    with {1, 256} weights (exact: sums < 2^17 < 2^24)."""
    j = jax.lax.broadcasted_iota(jnp.int32, (4 * LANES, LANES), 0)
    l = jax.lax.broadcasted_iota(jnp.int32, (4 * LANES, LANES), 1)
    sel = j // 4 == l
    t = j % 4
    lo = jnp.where(sel & (t < 2), 1 << (8 * t), 0)
    hi = jnp.where(sel & (t >= 2), 1 << (8 * (t - 2)), 0)
    return lo.astype(jnp.bfloat16), hi.astype(jnp.bfloat16)


def _psum32(x: jax.Array) -> jax.Array:
    """Flat inclusive prefix sum mod 2^32: byte-split MXU lane psums
    recombined (shifted adds wrap in i32 exactly as required), one shared
    cross-row ladder."""
    lane = (_lane_psum_mxu(x & 0xFF)
            + (_lane_psum_mxu((x >> 8) & 0xFF) << 8)
            + (_lane_psum_mxu((x >> 16) & 0xFF) << 16)
            + (_lane_psum_mxu((x >> 24) & 0xFF) << 24))
    return _cross_row_psum(lane)


def _encode_w4_kernel_factory(d_bits: int, flavor: str):
    ext_rows = _ext_bytes(0) // LANES

    def _kernel(x_ref, keys_ref, data_ref, total_ref, state_ref,
                carry_ref, stage_ref, sem):
        RV, _ = x_ref.shape
        V = RV * LANES
        SR = 4 * RV + ext_rows
        k = pl.program_id(0)
        nblocks = pl.num_programs(0)

        @pl.when(k == 0)
        def _():
            state_ref[0] = 0
            state_ref[1] = 0
            carry_ref[:] = jnp.zeros((AG_ROWS, LANES), jnp.int32)

        xi = x_ref[:].astype(jnp.int32)
        v, prev_out = _fwd_transform(flavor, xi, state_ref[1])
        state_ref[1] = prev_out

        c = _codes_w4(v)
        keys_ref[:] = _pack_keys_mxu(c).astype(jnp.uint8)
        lcnt = c + 1
        byte_sum = jnp.sum(lcnt)
        del_sum = 4 * V - byte_sum

        planes = []
        dels = []
        for t in range(4):
            surv = (lcnt > t).astype(jnp.int32)
            planes.append(((v >> (8 * t)) & 0xFF) * surv)
            dels.append(1 - surv)
        byte_int = _interleave4(planes)
        del_int = _interleave4(dels)
        D = _cross_row_psum(_lane_psum_mxu(del_int)) - del_int
        token = (byte_int | (D << D_SHIFT_W4)) * (1 - del_int)
        zpad = jnp.zeros((ext_rows, LANES), jnp.int32)
        token = jnp.concatenate([token, zpad], axis=0)
        token = _route_lsb_left(token, d_bits, D_SHIFT_W4, del_sum)
        data_bytes = token & 0xFF

        off = state_ref[0]
        a = off & (AG - 1)
        data_bytes = _flat_dyn_shift_right(data_bytes, a)
        carry_ext = jnp.concatenate(
            [carry_ref[:], jnp.zeros((SR - AG_ROWS, LANES), jnp.int32)],
            axis=0)
        staged = data_bytes | carry_ext

        @pl.when(k != 0)
        def _():
            pltpu.make_async_copy(
                stage_ref, data_ref.at[pl.ds(0, SR * LANES)], sem).wait()
        stage_ref[:] = staged.astype(jnp.int8).reshape(SR * LANES)

        wa = pl.multiple_of(off - a, AG)
        copy = pltpu.make_async_copy(
            stage_ref, data_ref.at[pl.ds(wa, SR * LANES)], sem)
        copy.start()

        @pl.when(k == nblocks - 1)
        def _():
            copy.wait()

        new_off = off + byte_sum
        tail_rel = (new_off & ~(AG - 1)) - (off - a)
        tail = _row_dyn_shift_left(staged, tail_rel)
        na = new_off & (AG - 1)
        cidx = jax.lax.broadcasted_iota(
            jnp.int32, (AG_ROWS, LANES), 0) * LANES + \
            jax.lax.broadcasted_iota(jnp.int32, (AG_ROWS, LANES), 1)
        carry_ref[:] = jnp.where(cidx < na, tail[:AG_ROWS], 0)
        state_ref[0] = new_off

        @pl.when(k == nblocks - 1)
        def _():
            total_ref[0] = new_off

    return _kernel


@functools.partial(jax.jit, static_argnames=("block", "flavor"))
def encode_w4_dense(x: jax.Array, block: int = 16384,
                    flavor: str = "zz32"):
    """W4 encode via the deletion-compaction network. Returns ``(keys u8
    [N//4], data i8 (padded), data_len)``."""
    assert flavor in W4_FLAVORS
    N = x.shape[0]
    assert x.dtype == _INPUT_DTYPE[flavor]
    assert N % block == 0 and block % 512 == 0
    d_bits = max((4 * block - 1).bit_length(), 1)
    assert D_SHIFT_W4 + d_bits <= 31
    nblocks = N // block
    RV = block // LANES
    out_len = 4 * N + 4 * block + _ext_bytes(0) + 2 * AG

    x2 = x.reshape(N // LANES, LANES)
    KR = RV // 4
    sr = 4 * RV + _ext_bytes(0) // LANES

    keys, data_x, total = pl.pallas_call(
        _encode_w4_kernel_factory(d_bits, flavor),
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
            jax.ShapeDtypeStruct((out_len,), jnp.int8),
            jax.ShapeDtypeStruct((1,), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.SMEM((2,), jnp.int32),
            pltpu.VMEM((AG_ROWS, LANES), jnp.int32),
            pltpu.VMEM((sr * LANES,), jnp.int8),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(x2)
    return keys.reshape(N // 4), data_x, total[0]


def _decode_w4_kernel_factory(d_bits: int, flavor: str):
    ext_rows = _ext_bytes(0) // LANES

    def _kernel(keys_ref, boff_ref, data_ref, out_ref, state_ref,
                stage_a, stage_b, sem_a, sem_b):
        RV = keys_ref.shape[0] * 4
        V = RV * LANES
        k = pl.program_id(0)
        nblocks = pl.num_programs(0)

        @pl.when(k == 0)
        def _():
            state_ref[0] = 0

        c = _unpack_keys_mxu(keys_ref[:])
        lcnt = c + 1
        byte_sum = jnp.sum(lcnt)
        del_sum = 4 * V - byte_sum

        FW = 4 * RV + ext_rows

        def _start_fetch(step, stage, sem):
            bo_s = boff_ref[step]
            ra_rows = pl.multiple_of(
                (bo_s - (bo_s & (AG - 1))) // LANES, AG_ROWS)
            pltpu.make_async_copy(
                data_ref.at[pl.ds(ra_rows, FW)], stage, sem).start()

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
        a = bo & (AG - 1)

        def _take(stage, sem):
            pltpu.make_async_copy(
                data_ref.at[pl.ds(0, FW)], stage, sem).wait()
            return stage[:]

        fetched = jax.lax.cond(
            even,
            lambda: _take(stage_a, sem_a),
            lambda: _take(stage_b, sem_b),
        ).astype(jnp.int32) & 0xFF
        fetched = _flat_dyn_shift_left(fetched, a)

        dels = []
        for t in range(4):
            dels.append(1 - (lcnt > t).astype(jnp.int32))
        del_int = _interleave4(dels)
        D = _cross_row_psum(_lane_psum_mxu(del_int)) - del_int
        meta = ((D << 1) | 1) * (1 - del_int)
        zpad = jnp.zeros((ext_rows, LANES), jnp.int32)
        meta = jnp.concatenate([meta, zpad], axis=0)
        meta = _route_lsb_left(meta, d_bits, 1, del_sum)
        assert 1 + d_bits + 8 <= 32
        token = meta | (fetched[:4 * RV + ext_rows] << (1 + d_bits))
        token = _pull_msb_right(token, d_bits, 1, del_sum)
        C = ((token >> (1 + d_bits)) & 0xFF)[:4 * RV]
        # Deleted slots keep fetch-window garbage — mask, then reassemble
        # with two exact matmuls.
        C = C * (1 - del_int)
        mlo, mhi = _assemble_mats()
        C2 = C.reshape(RV, 4 * LANES)
        v = _dot_i32(C2, mlo) | (_dot_i32(C2, mhi) << 16)

        if flavor == "none32":
            out_ref[:] = v
        elif flavor == "none16":
            out_ref[:] = (v & 0xFFFF).astype(jnp.uint16).astype(jnp.int16)
        elif flavor == "none8":
            out_ref[:] = (v & 0xFF).astype(jnp.uint8).astype(jnp.int8)
        else:  # zz32
            u = jax.lax.bitcast_convert_type(v, jnp.uint32)
            neg = jnp.uint32(0) - (u & 1)
            delta = jax.lax.bitcast_convert_type((u >> 1) ^ neg, jnp.int32)
            acc = _psum32(delta) + state_ref[0]
            out_ref[:] = acc
            state_ref[0] = _last_slot(acc)

    return _kernel


@functools.partial(jax.jit, static_argnames=("block", "flavor"))
def decode_w4_dense(keys: jax.Array, data_expanded: jax.Array,
                    block_offsets: jax.Array, block: int = 16384,
                    flavor: str = "zz32"):
    """Inverse of :func:`encode_w4_dense`; ``block_offsets`` from
    :func:`byte_offsets_from_keys_w4`."""
    assert flavor in W4_FLAVORS
    N = keys.shape[0] * 4
    assert N % block == 0 and block % 512 == 0
    d_bits = max((4 * block - 1).bit_length(), 1)
    nblocks = N // block
    RV = block // LANES

    need = 4 * N + 4 * block + _ext_bytes(0) + 2 * AG
    need += (-need) % LANES
    data_expanded = data_expanded.astype(jnp.int8)
    if data_expanded.shape[0] < need:
        data_expanded = jnp.concatenate(
            [data_expanded,
             jnp.zeros(need - data_expanded.shape[0], jnp.int8)])
    elif data_expanded.shape[0] % LANES:
        data_expanded = data_expanded[
            : data_expanded.shape[0] - data_expanded.shape[0] % LANES]
    data2 = data_expanded.reshape(-1, LANES)

    keys2 = keys.reshape(N // 512, LANES)
    KR = RV // 4
    fw = 4 * block + _ext_bytes(0)

    out = pl.pallas_call(
        _decode_w4_kernel_factory(d_bits, flavor),
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
            pltpu.VMEM((fw // LANES, LANES), jnp.int8),
            pltpu.VMEM((fw // LANES, LANES), jnp.int8),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(keys2, block_offsets.astype(jnp.int32), data2)
    return out.reshape(N)


def byte_offsets_from_keys_w4(keys: jax.Array, block: int) -> jax.Array:
    """Per-block BYTE offsets into the W4 data stream (codes are lengths
    minus one)."""
    kb = keys.astype(jnp.int32)
    per_byte = jnp.zeros_like(kb) + 4   # 4 values/key byte, 1 byte min each
    for sh in (0, 2, 4, 6):
        per_byte = per_byte + ((kb >> sh) & 3)
    bsum = per_byte.reshape(-1, block // 4).sum(axis=1)
    offs = jnp.cumsum(bsum) - bsum
    return offs.astype(jnp.int32)
