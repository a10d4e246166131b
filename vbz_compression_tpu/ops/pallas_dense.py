"""Dense leftward-compaction codec kernels (the dense-regime W2 plane).

The compact codec5 kernels route VALUE tokens rightward by E(i) = #code-1
values before i — depth log2(e_sum), ideal for signal content where e_sum
is tiny. For DENSE content (incompressible: nearly every delta needs two
bytes) e_sum ~ V and the compact budget overflows; the general kernel
(slack = block) runs the full log2(block) depth on every block and caps at
block 16384 to keep single-channel routing (ROADMAP "General kernels").

This module implements the round-4-designed DENSE LEFTWARD NETWORK
(ROADMAP "Dense leftward network"; soundness proof there): start from the
all-two-byte INTERLEAVED layout (lo/hi byte of value i at positions
2i/2i+1) and compact LEFT by D(i) = #code-0 values before i — the number
of deleted hi-byte slots. For dense content D is SMALL (uniform random
int16: ~0.4% code-0 → D < 512 per 64K block), so the active depth is
log2(c0_sum) instead of log2(e_sum), range-gated like the compact encode.

Why this maps to the hardware:
- BYTE tokens carry 8 payload bits + <= 16 displacement bits -> one i32
  channel at block 65536 (the general kernel needs split-meta channels or
  4x 16K blocks there).
- The element interleave/de-interleave (the cost the round-4 budget
  arithmetic flagged) runs as TWO bf16 MXU matmuls each (one per output
  row parity) by stacking the byte/displacement planes along the
  contraction-free axis — exact, operands <= 255.
- LSB-first leftward push with nondecreasing displacements and strictly
  increasing targets is collision-free (proof: ROADMAP). Deleted slots are
  all-zero tokens (the hi byte of a code-0 value is itself 0), so no
  occupancy bit is needed on the encode channel.

Wire output is IDENTICAL to the codec3/4/5 W2 formats (zz16 flavor).
Reference counterpart: the content-independent SSE decode loop
(/root/reference/vbz/v0/vbz_streamvbyte_impl_sse3.h:494-540) — the
reference runs full speed on any content; this network is how the TPU
plane approaches that on its worst-case tier.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_codec2 import LANES, _flat_shift_left, _flat_shift_right
from .pallas_codec3 import _INPUT_DTYPE, _codes_w2, _fwd_transform, _last_slot
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
    _ext_bytes,
    _flat_psum_mxu,
    _flat_psum_mxu16,
)

__all__ = ["encode_w2_dense", "decode_w2_dense",
           "encode_w2_dense_rows_flat",
           "decode_w2_dense_rows_flat"]

# Range-gate boundaries for the leftward stages: stages j >= GATES[k] run
# behind one cond on c0_sum >= 2^GATES[k] (sound: D <= c0_sum, so higher
# bits are provably zero). Uniform-random int16 content (c0 ~ 0.4%)
# runs only the ungated group.
GATES = (9, 13)


def _iota_flat(R: int) -> jax.Array:
    return (jax.lax.broadcasted_iota(jnp.int32, (R, LANES), 0) * LANES
            + jax.lax.broadcasted_iota(jnp.int32, (R, LANES), 1))


def _interleave_mats():
    """One-hot (256, 128) matrices mapping concat([plane_a, plane_b],
    lanes) rows to the even/odd interleaved output rows: out_even[2k+b] =
    (b ? plane_b : plane_a)[k] for k < 64, out_odd the same for k >= 64."""
    j = jax.lax.broadcasted_iota(jnp.int32, (2 * LANES, LANES), 0)
    l = jax.lax.broadcasted_iota(jnp.int32, (2 * LANES, LANES), 1)
    me = (((j < 64) & (l == 2 * j))
          | ((j >= 128) & (j < 192) & (l == 2 * (j - 128) + 1)))
    mo = (((j >= 64) & (j < 128) & (l == 2 * (j - 64)))
          | ((j >= 192) & (l == 2 * (j - 192) + 1)))
    return me.astype(jnp.bfloat16), mo.astype(jnp.bfloat16)


def _deinterleave_mats():
    """One-hot (256, 128) matrices for the inverse: from concat([even_rows,
    odd_rows], lanes) recover the lo and hi byte planes."""
    j = jax.lax.broadcasted_iota(jnp.int32, (2 * LANES, LANES), 0)
    l = jax.lax.broadcasted_iota(jnp.int32, (2 * LANES, LANES), 1)
    # even rows: lane 2k -> lo[k], lane 2k+1 -> hi[k] (k < 64)
    # odd rows (offset 128): lane 2k -> lo[64+k], lane 2k+1 -> hi[64+k]
    tlo = (((j < 128) & (j % 2 == 0) & (l == j // 2))
           | ((j >= 128) & (j % 2 == 0) & (l == 64 + (j - 128) // 2)))
    thi = (((j < 128) & (j % 2 == 1) & (l == j // 2))
           | ((j >= 128) & (j % 2 == 1) & (l == 64 + (j - 128) // 2)))
    return tlo.astype(jnp.bfloat16), thi.astype(jnp.bfloat16)


def _dot_i32(a: jax.Array, m: jax.Array) -> jax.Array:
    """Exact bf16 MXU matmul for integer operands <= 255 against a 0/1
    matrix (each output is one product; f32 accumulation exact)."""
    return jax.lax.dot_general(a.astype(jnp.bfloat16), m,
                               (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32
                               ).astype(jnp.int32)


def _interleave_planes(planes: list[tuple[jax.Array, jax.Array]]):
    """Interleave each (even_plane, odd_plane) pair of [RV,128] arrays into
    a [2*RV,128] array (flat positions 2i / 2i+1). All planes ride TWO
    matmuls total: pairs stack along the row axis (no extra contraction
    cost), outputs split back."""
    RV = planes[0][0].shape[0]
    me, mo = _interleave_mats()
    cat = jnp.concatenate(
        [jnp.concatenate([a, b], axis=1) for a, b in planes], axis=0)
    ev = _dot_i32(cat, me)
    od = _dot_i32(cat, mo)
    outs = []
    for k in range(len(planes)):
        e = ev[k * RV:(k + 1) * RV]
        o = od[k * RV:(k + 1) * RV]
        outs.append(jnp.concatenate([e, o], axis=1).reshape(2 * RV, LANES))
    return outs


def _route_lsb_left(chan: jax.Array, d_bits: int, d_shift: int,
                    c0_sum) -> jax.Array:
    """LSB-first leftward monotone push: a token whose displacement bit j
    (at ``d_shift + j``) is set moves left by 2^j at stage j. Empty slots
    are all-zero. Stages above each GATES boundary sit behind one cond on
    ``c0_sum`` (D <= c0_sum makes them provably no-ops below it)."""
    def stages(chan, lo, hi):
        for j in range(lo, hi + 1):
            rolled = _flat_shift_left(chan, 1 << j)
            bit_rolled = (rolled >> (d_shift + j)) & 1
            bit_stay = (chan >> (d_shift + j)) & 1
            chan = jnp.where(bit_rolled == 1, rolled,
                             jnp.where(bit_stay == 0, chan, 0))
        return chan

    # Ungated low group, then each upper group ONCE behind its own cond,
    # in ascending (LSB-first) order. (A first cut ran the middle groups
    # both ungated and inside their gate — a double push that corrupted
    # any block with c0_sum past the first gate; caught on-chip by the
    # s200 round-trip assert, tools/ab_dense.py.)
    bounds = [g for g in GATES if g < d_bits]
    chan = stages(chan, 0, (bounds[0] - 1) if bounds else d_bits - 1)
    for k, g in enumerate(bounds):
        hi = (bounds[k + 1] - 1) if k + 1 < len(bounds) else d_bits - 1
        chan = jax.lax.cond(
            c0_sum >= (1 << g),
            lambda c, g=g, hi=hi: stages(c, g, hi),
            lambda c: c, chan)
    return chan


def _pull_msb_right(chan: jax.Array, d_bits: int, d_shift: int,
                    c0_sum) -> jax.Array:
    """Exact inverse of :func:`_route_lsb_left` (mask-free fused replay,
    mirrored): undo stages MSB-first; a slot takes the token pulled from
    ``p - 2^j`` iff that token's bit j is set."""
    def stages(chan, hi, lo):
        for j in range(hi, lo - 1, -1):
            rolled = _flat_shift_right(chan, 1 << j)
            bit_rolled = (rolled >> (d_shift + j)) & 1
            bit_stay = (chan >> (d_shift + j)) & 1
            chan = jnp.where(bit_rolled == 1, rolled,
                             jnp.where(bit_stay == 0, chan, 0))
        return chan

    bounds = [g for g in GATES if g < d_bits]
    # gated upper groups first (MSB-first order)
    for k in range(len(bounds) - 1, -1, -1):
        g = bounds[k]
        hi = (bounds[k + 1] - 1) if k + 1 < len(bounds) else d_bits - 1
        chan = jax.lax.cond(
            c0_sum >= (1 << g),
            lambda c, g=g, hi=hi: stages(c, hi, g),
            lambda c: c, chan)
    hi = (bounds[0] - 1) if bounds else d_bits - 1
    chan = stages(chan, hi, 0)
    return chan


def _encode_dense_kernel_factory(d_bits: int, flavor: str, bpr: int = 0,
                                 stride: int = 0):
    # ``bpr``/``stride``: blocks per row and per-row output region for
    # BATCHED grids (the codec5 rows_flat pattern: the flat grid walks
    # rows back-to-back, per-row state resets at row boundaries).
    ext_rows = _ext_bytes(0) // LANES  # alignment headroom only

    def _kernel(x_ref, keys_ref, data_ref, total_ref, state_ref,
                carry_ref, stage_ref, sem):
        RV, _ = x_ref.shape
        V = RV * LANES
        SR = 2 * RV + ext_rows
        k = pl.program_id(0)
        nblocks = pl.num_programs(0)
        if bpr:
            lk = jax.lax.rem(k, bpr)
            row = jax.lax.div(k, bpr)
            row_last = lk == bpr - 1
            base = row * stride
        else:
            lk, row = k, 0
            row_last = k == nblocks - 1
            base = 0

        @pl.when(lk == 0)
        def _():
            state_ref[0] = 0
            state_ref[1] = 0
            carry_ref[:] = jnp.zeros((AG_ROWS, LANES), jnp.int32)

        xi = x_ref[:].astype(jnp.int32)
        if flavor == "zz16":
            xi = xi & 0xFFFF
        v, prev_out = _fwd_transform(flavor, xi, state_ref[1])
        state_ref[1] = prev_out

        c = _codes_w2(v)
        keys_ref[:] = _pack_keys_mxu(c).astype(jnp.uint8)
        e_sum = jnp.sum(c)
        c0_sum = V - e_sum
        block_len = V + e_sum

        E = _flat_psum_mxu(c) - c
        D = _iota_flat(RV) - E          # #code-0 values before i, < 2^16
        lo = v & 0xFF
        hi = v >> 8                     # 0 exactly when c == 0 (v < 256)
        d0 = D & 0xFF
        d1 = D >> 8
        by, i0, i1 = _interleave_planes(
            [(lo, hi), (d0, d0 * c), (d1, d1 * c)])
        token = by | (i0 << 8) | (i1 << 16)
        token = _route_lsb_left(token, d_bits, 8, c0_sum)
        data_bytes = jnp.concatenate(
            [token & 0xFF, jnp.zeros((ext_rows, LANES), jnp.int32)], axis=0)

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

        wa = pl.multiple_of(base + off - a, AG)
        copy = pltpu.make_async_copy(
            stage_ref, data_ref.at[pl.ds(wa, SR * LANES)], sem)
        copy.start()

        @pl.when(k == nblocks - 1)
        def _():
            copy.wait()

        new_off = off + block_len
        tail_rel = (new_off & ~(AG - 1)) - (off - a)
        tail = _row_dyn_shift_left(staged, tail_rel)
        na = new_off & (AG - 1)
        cidx = jax.lax.broadcasted_iota(
            jnp.int32, (AG_ROWS, LANES), 0) * LANES + \
            jax.lax.broadcasted_iota(jnp.int32, (AG_ROWS, LANES), 1)
        carry_ref[:] = jnp.where(cidx < na, tail[:AG_ROWS], 0)
        state_ref[0] = new_off

        @pl.when(row_last)
        def _():
            total_ref[row if bpr else 0] = new_off

    return _kernel


@functools.partial(jax.jit, static_argnames=("block", "flavor"))
def encode_w2_dense(x: jax.Array, block: int = 65536,
                    flavor: str = "zz16"):
    """Worst-case-safe dense-regime encode: identical wire output to
    :func:`..pallas_codec5.encode_w2_general`, but via the leftward
    compaction network — adaptive depth log2(c0_sum) at block 65536 with a
    single i32 channel. Returns ``(keys u8 [N//4], data i8, data_len)``.
    No overflow is possible (every input fits the 2V interleaved span)."""
    assert flavor == "zz16", "dense network is the 2-byte-dominant regime"
    N = x.shape[0]
    assert x.dtype == _INPUT_DTYPE[flavor]
    assert N % block == 0 and block % 512 == 0
    d_bits = max((block - 1).bit_length(), 1)
    assert 8 + d_bits + 8 <= 32
    nblocks = N // block
    RV = block // LANES
    out_len = 2 * N + 2 * block + _ext_bytes(0) + 2 * AG

    x2 = x.reshape(N // LANES, LANES)
    KR = RV // 4
    ext_rows = _ext_bytes(0) // LANES

    keys, data_x, total = pl.pallas_call(
        _encode_dense_kernel_factory(d_bits, flavor),
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
            pltpu.VMEM((2 * block + _ext_bytes(0),), jnp.int8),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(x2)
    return keys.reshape(N // 4), data_x, total[0]


def _row_stride_dense(N: int, block: int) -> int:
    """Per-row output region for the batched dense layout (worst case all
    two-byte values + the staging span + alignment)."""
    out_len = 2 * N + 2 * block + _ext_bytes(0) + 2 * AG
    return -(-out_len // AG) * AG


@functools.partial(jax.jit, static_argnames=("batch", "block", "flavor"))
def encode_w2_dense_rows_flat(x2: jax.Array, batch: int,
                              block: int = 65536, flavor: str = "zz16"):
    """Batched dense encode in the kernels' native flat layout (the codec5
    rows_flat pattern — one kernel program per batch, per-row state
    resets, no XLA relayouts). Returns ``(keys u8 (batch*N//512, 128),
    data i8 (batch*stride,), data_lens i32 [batch])``."""
    assert flavor == "zz16"
    R, lanes = x2.shape
    assert lanes == LANES and x2.dtype == _INPUT_DTYPE[flavor]
    B = batch
    assert R % B == 0
    N = R // B * LANES
    assert N % block == 0 and block % 512 == 0
    d_bits = max((block - 1).bit_length(), 1)
    nb = N // block
    RV = block // LANES
    stride = _row_stride_dense(N, block)
    KR = RV // 4

    keys, data_x, totals = pl.pallas_call(
        _encode_dense_kernel_factory(d_bits, flavor, bpr=nb, stride=stride),
        grid=(B * nb,),
        in_specs=[pl.BlockSpec((RV, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec((KR, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B * N // 512, LANES), jnp.uint8),
            jax.ShapeDtypeStruct((B * stride,), jnp.int8),
            jax.ShapeDtypeStruct((B,), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.SMEM((2,), jnp.int32),
            pltpu.VMEM((AG_ROWS, LANES), jnp.int32),
            pltpu.VMEM((2 * block + _ext_bytes(0),), jnp.int8),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(x2)
    return keys, data_x, totals


def _decode_dense_kernel_factory(d_bits: int, flavor: str, bpr: int = 0):
    ext_rows = _ext_bytes(0) // LANES

    def _kernel(keys_ref, boff_ref, data_ref, out_ref, state_ref,
                stage_a, stage_b, sem_a, sem_b):
        RV = keys_ref.shape[0] * 4
        V = RV * LANES
        k = pl.program_id(0)
        nblocks = pl.num_programs(0)
        row_first = jax.lax.rem(k, bpr) == 0 if bpr else k == 0

        @pl.when(row_first)
        def _():
            state_ref[0] = 0

        c = (_unpack_keys_mxu(keys_ref[:]) != 0).astype(jnp.int32)
        e_sum = jnp.sum(c)
        c0_sum = V - e_sum

        FW_ROWS = 2 * RV + ext_rows

        def _start_fetch(step, stage, sem):
            bo_s = boff_ref[step]
            ra_rows = pl.multiple_of(
                (bo_s - (bo_s & (AG - 1))) // LANES, AG_ROWS)
            pltpu.make_async_copy(
                data_ref.at[pl.ds(ra_rows, FW_ROWS)], stage, sem).start()

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
                data_ref.at[pl.ds(0, FW_ROWS)], stage, sem).wait()
            return stage[:]

        fetched = jax.lax.cond(
            even,
            lambda: _take(stage_a, sem_a),
            lambda: _take(stage_b, sem_b),
        ).astype(jnp.int32) & 0xFF
        fetched = _flat_dyn_shift_left(fetched, a)

        # Meta at interleaved positions: occ | D << 1 (even slot: always
        # present; odd slot: present iff c). D <= c0_sum < 2^16.
        E = _flat_psum_mxu(c) - c
        D = _iota_flat(RV) - E
        ones = jnp.ones((RV, LANES), jnp.int32)
        d0 = D & 0xFF
        d1 = D >> 8
        occ_i, i0, i1 = _interleave_planes(
            [(ones, c), (d0, d0 * c), (d1, d1 * c)])
        meta = occ_i | (i0 << 1) | (i1 << 9)
        # Forward: learn each surviving token's STREAM slot (the encode
        # network on the meta channel alone).
        meta = _route_lsb_left(meta, d_bits, 1, c0_sum)
        # Attach the payload — the fetched bytes ARE the stream content.
        token = meta | (fetched[:2 * RV] << (1 + d_bits))
        token = _pull_msb_right(token, d_bits, 1, c0_sum)
        C = (token >> (1 + d_bits)) & 0xFF

        # De-interleave via two exact matmuls. The flat-preserving
        # (2RV,128)->(RV,256) reshape puts row pair (2r, 2r+1) side by
        # side — exactly the concat([C_even, C_odd], lanes) the matrices
        # expect (sublane-STRIDED reads of a computed value lower to a
        # gather and fail on hardware; this reshape is free).
        tlo, thi = _deinterleave_mats()
        catC = C.reshape(RV, 2 * LANES)
        lo = _dot_i32(catC, tlo)
        hi = _dot_i32(catC, thi)
        # Deleted (code-0) hi slots never receive a pulled token and keep
        # whatever garbage the fetch window held past the stream end — the
        # code mask zeroes them (the codec5 replay's `* c` trick).
        vals = lo | ((hi * c) << 8)

        u = jax.lax.bitcast_convert_type(vals, jnp.uint32)
        neg = jnp.uint32(0) - (u & 1)
        delta = jax.lax.bitcast_convert_type(
            ((u >> 1) ^ neg) & 0xFFFF, jnp.int32)
        acc = _flat_psum_mxu16(delta) + state_ref[0]
        out16 = acc & 0xFFFF
        out_ref[:] = out16.astype(jnp.uint16).astype(jnp.int16)
        state_ref[0] = _last_slot(out16)

    return _kernel


@functools.partial(jax.jit, static_argnames=("block", "flavor"))
def decode_w2_dense(keys: jax.Array, data_expanded: jax.Array,
                    block_offsets: jax.Array, block: int = 65536,
                    flavor: str = "zz16"):
    """Inverse of :func:`encode_w2_dense` (decodes any well-formed W2
    stream — the wire format is block-agnostic)."""
    assert flavor == "zz16"
    N = keys.shape[0] * 4
    assert N % block == 0 and block % 512 == 0
    d_bits = max((block - 1).bit_length(), 1)
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
    fw = 2 * block + _ext_bytes(0)

    out = pl.pallas_call(
        _decode_dense_kernel_factory(d_bits, flavor),
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


def _block_offsets_rows_dense(keys2: jax.Array, batch: int, block: int,
                              stride: int) -> jax.Array:
    """Per-block data offsets from the flat key layout, each row based at
    ``row * stride`` (the batched dense data layout)."""
    kb = keys2.astype(jnp.int32)
    extra = (((kb & 3) != 0).astype(jnp.int32)
             + (((kb >> 2) & 3) != 0).astype(jnp.int32)
             + (((kb >> 4) & 3) != 0).astype(jnp.int32)
             + (((kb >> 6) & 3) != 0).astype(jnp.int32))
    per_keyrow = extra.sum(axis=1)
    bsum = block + per_keyrow.reshape(batch, -1, block // 512).sum(axis=2)
    offs = jnp.cumsum(bsum, axis=1) - bsum
    offs = offs + stride * jnp.arange(batch, dtype=jnp.int32)[:, None]
    return offs.reshape(-1).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("batch", "block", "flavor"))
def decode_w2_dense_rows_flat(keys2: jax.Array, data_expanded: jax.Array,
                              batch: int, block: int = 65536,
                              flavor: str = "zz16"):
    """Inverse of :func:`encode_w2_dense_rows_flat` (flat layouts both
    sides); returns ``(batch*N//128, 128)``."""
    assert flavor == "zz16"
    B = batch
    KRALL, lanes = keys2.shape
    assert lanes == LANES and KRALL % B == 0
    N = KRALL // B * 512
    assert N % block == 0 and block % 512 == 0
    d_bits = max((block - 1).bit_length(), 1)
    nb = N // block
    RV = block // LANES
    stride = _row_stride_dense(N, block)
    assert data_expanded.shape == (B * stride,), \
        f"want data ({B * stride},), got {data_expanded.shape}"

    boffs = _block_offsets_rows_dense(keys2, B, block, stride)
    data2 = data_expanded.astype(jnp.int8).reshape(-1, LANES)
    KR = RV // 4
    fw = 2 * block + _ext_bytes(0)

    out = pl.pallas_call(
        _decode_dense_kernel_factory(d_bits, flavor, bpr=nb),
        grid=(B * nb,),
        in_specs=[
            pl.BlockSpec((KR, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((RV, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (B * N // LANES, LANES), _INPUT_DTYPE[flavor]),
        scratch_shapes=[
            pltpu.SMEM((1,), jnp.int32),
            pltpu.VMEM((fw // LANES, LANES), jnp.int8),
            pltpu.VMEM((fw // LANES, LANES), jnp.int8),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(keys2, boffs, data2)
    return out
