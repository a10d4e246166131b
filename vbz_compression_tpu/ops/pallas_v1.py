"""Pallas TPU kernels for the v1 half-byte wire format (int8).

Round 4 closed "v1 nibble -> Pallas" as a mathematical negative: the
parity-split byte-channel formulation needs a monotone push with
NON-monotone displacements (ROADMAP "v1 nibble Pallas kernel"). Round 5's
dense leftward network (pallas_dense) dissolved the obstruction for a
different FRAMING of the same problem: start from a UNIFORM layout and
compact by deletion. v1 fits that framing exactly:

- every value gets FOUR nibble slots (code 3's full width); value i's
  code c keeps its first l = (1 << c) >> 1 in {0, 1, 2, 4} slots and
  deletes the rest;
- all surviving slots of value i share ONE leftward displacement
  D(i) = #deleted slots before (deleted slots inside a value sit at its
  tail, so survivors never straddle them) — nondecreasing, strictly
  increasing targets: the collision-free LSB-first leftward push of
  pallas_dense applies verbatim;
- tokens are NIBBLES (4 payload bits) + D (<= 17 bits at block 16384)
  in one i32 channel, with the stage groups range-gated on the deleted
  count;
- the 4-way value->nibble interleave and its inverse ride exact bf16
  MXU matmuls (the value reassembly is ONE matmul against a
  {1,16,256,4096} one-hot — powers of two are bf16-exact and the 4-term
  f32 sums stay below 2^24).

Wire output is identical to the scalar oracle / reference v1
(reference vbz/v1/vbz_streamvbyte_impl.h:88-180: nibble stream packed
low-nibble-first, (count+3)/4 key bytes). The stream is nibble-granular,
so the cross-block alignment/carry machinery of the byte kernels runs
one level down: blocks stage in nibble space, shift by the nibble
misalignment, and pack to bytes with an OR-carry that merges the byte
shared between adjacent blocks.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_codec2 import LANES
from .pallas_codec3 import _last_slot
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
from .pallas_dense import (
    _dot_i32,
    _interleave_planes,
    _pull_msb_right,
    _route_lsb_left,
)

__all__ = ["encode_v1", "decode_v1"]

# token layout (encode channel): nibble bits [0,4), D bits [4, 4+17)
D_SHIFT_V1 = 4


def _iota_flat(R: int) -> jax.Array:
    return (jax.lax.broadcasted_iota(jnp.int32, (R, LANES), 0) * LANES
            + jax.lax.broadcasted_iota(jnp.int32, (R, LANES), 1))


def _interleave4_mats():
    """One-hot (512, 128) matrices for the 4-way interleave: plane t of a
    128-value row maps to out rows 4r+s, lane 4*(j-32s)+t for
    j in [32s, 32(s+1))."""
    j = jax.lax.broadcasted_iota(jnp.int32, (4 * LANES, LANES), 0)
    l = jax.lax.broadcasted_iota(jnp.int32, (4 * LANES, LANES), 1)
    t = j // LANES          # source plane
    jj = j % LANES          # source lane (value index within the row)
    mats = []
    for s in range(4):
        m = ((jj >= 32 * s) & (jj < 32 * (s + 1))
             & (l == 4 * (jj - 32 * s) + t))
        mats.append(m.astype(jnp.bfloat16))
    return mats


def _interleave4(planes):
    """[RV,128] planes p0..p3 -> [4*RV,128] with flat slot 4i+t = p_t[i]."""
    RV = planes[0].shape[0]
    cat = jnp.concatenate(planes, axis=1)          # (RV, 512)
    mats = _interleave4_mats()
    outs = [_dot_i32(cat, m) for m in mats]        # 4 x (RV, 128)
    return jnp.concatenate(outs, axis=1).reshape(4 * RV, LANES)


def _assemble_values_mat():
    """(512, 128) matrix summing each value's 4 nibbles with 16^t weights
    (exact: powers of two are bf16-exact; sums < 2^16 < 2^24)."""
    j = jax.lax.broadcasted_iota(jnp.int32, (4 * LANES, LANES), 0)
    l = jax.lax.broadcasted_iota(jnp.int32, (4 * LANES, LANES), 1)
    w = jnp.where(j // 4 == l, 1 << (4 * (j % 4)), 0)
    return w.astype(jnp.bfloat16)


def _v1_codes(v: jax.Array) -> jax.Array:
    """v (uint32 semantics in an i32 carrier) -> v1 code: 0 for 0, 1 for
    <16, 2 for <256, 3 otherwise (incl. 'negative' i32 = huge uint32)."""
    nonneg = v >= 0
    return jnp.where(v == 0, 0,
                     jnp.where(nonneg & (v < 16), 1,
                               jnp.where(nonneg & (v < 256), 2, 3)))


def _fwd_v1(flavor: str, xi: jax.Array, prev0):
    """int8 input (widened to i32, sign-extended) -> v1 values: 32-bit
    zig-zag delta (reference generic path semantics) or identity."""
    from .pallas_codec2 import _flat_shift_right

    RV = xi.shape[0]
    if flavor == "none8":
        return xi, jnp.int32(0)
    prev_arr = _flat_shift_right(xi, 1)
    ridx = jax.lax.broadcasted_iota(jnp.int32, (RV, LANES), 0)
    lidx = jax.lax.broadcasted_iota(jnp.int32, (RV, LANES), 1)
    prev_arr = jnp.where((ridx == 0) & (lidx == 0), prev0, prev_arr)
    d = xi - prev_arr
    return (d << 1) ^ (d >> 31), _last_slot(xi)


def _encode_v1_kernel_factory(d_bits: int, flavor: str):
    ext_nib_rows = 2 * _ext_bytes(0) // LANES  # nibble-space headroom

    def _kernel(x_ref, keys_ref, data_ref, total_ref, state_ref,
                carry_ref, stage_ref, sem):
        RV, _ = x_ref.shape
        V = RV * LANES
        NR = 4 * RV + ext_nib_rows          # staged nibble rows
        SRB = NR // 2                       # staged byte rows
        k = pl.program_id(0)
        nblocks = pl.num_programs(0)

        @pl.when(k == 0)
        def _():
            state_ref[0] = 0                # running NIBBLE offset
            state_ref[1] = 0                # previous sample
            carry_ref[:] = jnp.zeros((AG_ROWS, LANES), jnp.int32)

        xi = x_ref[:].astype(jnp.int32)
        v, prev_out = _fwd_v1(flavor, xi, state_ref[1])
        state_ref[1] = prev_out

        c = _v1_codes(v)
        keys_ref[:] = _pack_keys_mxu(c).astype(jnp.uint8)
        lcnt = jnp.where(c == 0, 0, jnp.where(c == 1, 1,
                                              jnp.where(c == 2, 2, 4)))
        nib_sum = jnp.sum(lcnt)
        del_sum = 4 * V - nib_sum

        # Nibble payload planes (masked to the value's count) and deleted
        # indicators.
        planes = []
        dels = []
        for t in range(4):
            surv = (lcnt > t).astype(jnp.int32)
            planes.append(((v >> (4 * t)) & 0xF) * surv)
            dels.append(1 - surv)
        nib_int = _interleave4(planes)                  # (4RV, 128)
        del_int = _interleave4(dels)
        # D at every nibble slot = exclusive psum of deleted indicators
        # (0/1 operands -> MXU lane psum + cross-row ladder).
        D = _cross_row_psum(_lane_psum_mxu(del_int)) - del_int
        token = (nib_int | (D << D_SHIFT_V1)) * (1 - del_int)
        zpad = jnp.zeros((ext_nib_rows, LANES), jnp.int32)
        token = jnp.concatenate([token, zpad], axis=0)
        token = _route_lsb_left(token, d_bits, D_SHIFT_V1, del_sum)
        nibs = token & 0xF                              # (NR, 128)

        # Nibble-space alignment: shift right so the first nibble lands at
        # its in-byte position relative to the AG-aligned write base.
        off = state_ref[0]                              # nibbles
        byte_off = off >> 1
        a_byte = byte_off & (AG - 1)
        a_nib = 2 * a_byte + (off & 1)
        nibs = _flat_dyn_shift_right(nibs, a_nib)

        # Pack nibble pairs to bytes: (NR,128)->(NR/2,256) puts pairs side
        # by side; two one-hot matmuls pick even/odd members.
        u = nibs.reshape(SRB, 2 * LANES)
        jj = jax.lax.broadcasted_iota(jnp.int32, (2 * LANES, LANES), 0)
        ll = jax.lax.broadcasted_iota(jnp.int32, (2 * LANES, LANES), 1)
        p_even = ((jj % 2 == 0) & (ll == jj // 2)).astype(jnp.bfloat16)
        p_odd = ((jj % 2 == 1) & (ll == jj // 2)).astype(jnp.bfloat16)
        data_bytes = _dot_i32(u, p_even) | (_dot_i32(u, p_odd) << 4)

        carry_ext = jnp.concatenate(
            [carry_ref[:], jnp.zeros((SRB - AG_ROWS, LANES), jnp.int32)],
            axis=0)
        staged = data_bytes | carry_ext

        @pl.when(k != 0)
        def _():
            pltpu.make_async_copy(
                stage_ref, data_ref.at[pl.ds(0, SRB * LANES)], sem).wait()
        stage_ref[:] = staged.astype(jnp.int8).reshape(SRB * LANES)

        wa = pl.multiple_of(byte_off - a_byte, AG)
        copy = pltpu.make_async_copy(
            stage_ref, data_ref.at[pl.ds(wa, SRB * LANES)], sem)
        copy.start()

        @pl.when(k == nblocks - 1)
        def _():
            copy.wait()

        new_off = off + nib_sum                         # nibbles
        new_byte = (new_off + 1) >> 1                   # bytes occupied
        tail_rel = (new_byte & ~(AG - 1)) - (byte_off - a_byte)
        tail = _row_dyn_shift_left(staged, tail_rel)
        na = new_byte & (AG - 1)
        # The byte at na-1 may be half-filled (odd nibble count): keep it
        # in the carry too so the next block ORs its high nibble in.
        keep = na + (new_off & 1)
        cidx = jax.lax.broadcasted_iota(
            jnp.int32, (AG_ROWS, LANES), 0) * LANES + \
            jax.lax.broadcasted_iota(jnp.int32, (AG_ROWS, LANES), 1)
        carry_ref[:] = jnp.where(cidx < keep, tail[:AG_ROWS], 0)
        state_ref[0] = new_off

        @pl.when(k == nblocks - 1)
        def _():
            total_ref[0] = new_off

    return _kernel


@functools.partial(jax.jit, static_argnames=("block", "flavor"))
def encode_v1(x: jax.Array, block: int = 16384, flavor: str = "zz8"):
    """v1 half-byte encode on device. ``x`` int8; returns ``(keys u8
    [N//4], data i8 (padded), total_nibbles)`` — the wire stream is
    ``keys + data[: (total_nibbles + 1) // 2]``."""
    assert flavor in ("zz8", "none8")
    N = x.shape[0]
    assert x.dtype == jnp.int8
    assert N % block == 0 and block % 512 == 0
    d_bits = max((4 * block - 1).bit_length(), 1)
    assert D_SHIFT_V1 + d_bits <= 31
    nblocks = N // block
    RV = block // LANES
    # max data bytes: 2 bytes per value + staging span + alignment
    out_len = 2 * N + 2 * block + _ext_bytes(0) + 2 * AG

    x2 = x.reshape(N // LANES, LANES)
    KR = RV // 4
    ext_nib_rows = 2 * _ext_bytes(0) // LANES
    srb = (4 * RV + ext_nib_rows) // 2

    keys, data_x, total = pl.pallas_call(
        _encode_v1_kernel_factory(d_bits, flavor),
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
            pltpu.VMEM((srb * LANES,), jnp.int8),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(x2)
    return keys.reshape(N // 4), data_x, total[0]


def _decode_v1_kernel_factory(d_bits: int, flavor: str):
    ext_nib_rows = 2 * _ext_bytes(0) // LANES

    def _kernel(keys_ref, boff_ref, data_ref, out_ref, state_ref,
                stage_a, stage_b, sem_a, sem_b):
        RV = keys_ref.shape[0] * 4
        V = RV * LANES
        NR = 4 * RV + ext_nib_rows
        k = pl.program_id(0)
        nblocks = pl.num_programs(0)

        @pl.when(k == 0)
        def _():
            state_ref[0] = 0

        c = _unpack_keys_mxu(keys_ref[:])
        lcnt = jnp.where(c == 0, 0, jnp.where(c == 1, 1,
                                              jnp.where(c == 2, 2, 4)))
        nib_sum = jnp.sum(lcnt)
        del_sum = 4 * V - nib_sum

        # Fetch the byte window (AG-aligned), double-buffered.
        FWB = (2 * V + _ext_bytes(0)) // LANES    # byte rows per window

        def _start_fetch(step, stage, sem):
            nib_off = boff_ref[step]
            byte_off = nib_off >> 1
            ra_rows = pl.multiple_of(
                (byte_off - (byte_off & (AG - 1))) // LANES, AG_ROWS)
            pltpu.make_async_copy(
                data_ref.at[pl.ds(ra_rows, FWB)], stage, sem).start()

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

        nib_off = boff_ref[k]
        byte_off = nib_off >> 1
        a_nib = 2 * (byte_off & (AG - 1)) + (nib_off & 1)

        def _take(stage, sem):
            pltpu.make_async_copy(
                data_ref.at[pl.ds(0, FWB)], stage, sem).wait()
            return stage[:]

        fetched = jax.lax.cond(
            even,
            lambda: _take(stage_a, sem_a),
            lambda: _take(stage_b, sem_b),
        ).astype(jnp.int32) & 0xFF

        # Expand bytes to the nibble stream (low nibble first): the 2-way
        # interleave of (byte & 0xF, byte >> 4).
        nib_all = _interleave_planes(
            [(fetched & 0xF, fetched >> 4)])[0]       # (2*FWB, 128)
        nib_all = _flat_dyn_shift_left(nib_all, a_nib)
        nibs = nib_all[:NR]

        # Meta at interleaved positions: D = psum of deleted indicators,
        # zeroed on deleted slots.
        dels = []
        for t in range(4):
            dels.append(1 - (lcnt > t).astype(jnp.int32))
        del_int = _interleave4(dels)
        D = _cross_row_psum(_lane_psum_mxu(del_int)) - del_int
        meta = ((D << 1) | 1) * (1 - del_int)
        zpad = jnp.zeros((ext_nib_rows, LANES), jnp.int32)
        meta = jnp.concatenate([meta, zpad], axis=0)
        meta = _route_lsb_left(meta, d_bits, 1, del_sum)
        token = meta | (nibs << (1 + d_bits))
        token = _pull_msb_right(token, d_bits, 1, del_sum)
        C = ((token >> (1 + d_bits)) & 0xF)[:4 * RV]

        # Value reassembly: one exact matmul with 16^t weights; deleted
        # slots hold zero tokens and contribute nothing... except garbage
        # kept from the fetch window past the stream end — mask those by
        # re-applying the deletion pattern.
        C = C * (1 - del_int)
        v = _dot_i32(C.reshape(RV, 4 * LANES), _assemble_values_mat())

        if flavor == "none8":
            out_ref[:] = (v & 0xFF).astype(jnp.uint8).astype(jnp.int8)
        else:
            u = jax.lax.bitcast_convert_type(v, jnp.uint32)
            neg = jnp.uint32(0) - (u & 1)
            delta8 = jax.lax.bitcast_convert_type(
                ((u >> 1) ^ neg) & 0xFF, jnp.int32)
            acc = _cross_row_psum(_lane_psum_mxu(delta8)) + state_ref[0]
            out8 = acc & 0xFF
            out_ref[:] = out8.astype(jnp.uint8).astype(jnp.int8)
            state_ref[0] = _last_slot(out8)

    return _kernel


@functools.partial(jax.jit, static_argnames=("block", "flavor"))
def decode_v1(keys: jax.Array, data_expanded: jax.Array,
              nib_offsets: jax.Array, block: int = 16384,
              flavor: str = "zz8"):
    """Inverse of :func:`encode_v1`. ``nib_offsets``: per-block NIBBLE
    offsets into the data stream (from :func:`nib_offsets_from_keys`)."""
    assert flavor in ("zz8", "none8")
    N = keys.shape[0] * 4
    assert N % block == 0 and block % 512 == 0
    d_bits = max((4 * block - 1).bit_length(), 1)
    nblocks = N // block
    RV = block // LANES

    need = 2 * N + 2 * block + _ext_bytes(0) + 2 * AG
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
    fwb = (2 * block + _ext_bytes(0)) // LANES

    out = pl.pallas_call(
        _decode_v1_kernel_factory(d_bits, flavor),
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((KR, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((RV, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N // LANES, LANES), jnp.int8),
        scratch_shapes=[
            pltpu.SMEM((1,), jnp.int32),
            pltpu.VMEM((fwb, LANES), jnp.int8),
            pltpu.VMEM((fwb, LANES), jnp.int8),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(keys2, nib_offsets.astype(jnp.int32), data2)
    return out.reshape(N)


def nib_offsets_from_keys(keys: jax.Array, block: int) -> jax.Array:
    """Per-block NIBBLE offsets into the v1 data stream (XLA, from the key
    bytes alone — the v1 counterpart of block_offsets_from_keys_flat)."""
    kb = keys.astype(jnp.int32)
    nibs = jnp.int32(0)
    per_byte = jnp.zeros_like(kb)
    for sh in (0, 2, 4, 6):
        code = (kb >> sh) & 3
        per_byte = per_byte + ((1 << code) >> 1)
    bsum = per_byte.reshape(-1, block // 4).sum(axis=1)
    offs = jnp.cumsum(bsum) - bsum
    return offs.astype(jnp.int32)
