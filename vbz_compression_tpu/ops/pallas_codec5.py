"""Pallas TPU codec kernels, v5 — int8 data plane (W2 hot path).

codec4 moves the expanded data section as ONE int32 PER BYTE (4x HBM write
amplification on encode, 4x read on decode) because round-1 probing only
established i32 DMA. Round-2 probing (tools/probe_i8dma.py) shows Mosaic
handles 1-D **int8** refs: flat i8 VMEM scratch, dynamic-offset DMA against
i8 HBM refs (offsets provably divisible by the i8 tiling 4096), and
i8<->i32 casts (cast the flat vector FIRST, then reshape — the fused
reshape+cast of a 1-D i8 load crashes the remote compiler).

v5 therefore stages bytes as i8: in-VMEM routing/assembly still runs in
i32 (VPU-native), but the staging buffers, the DMA, and the HBM data
section are bytes — the alignment granularity grows to 4096 (i8 tiling),
which the codec4 alignment-split absorbs (the misalignment is a uniform
dynamic shift, not routing displacement). Wire output is IDENTICAL to
codec3/4; only the expanded-array dtype changes (i8, one true byte each).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_codec2 import (
    LANES,
    _flat_prefix_sum_incl,
    _flat_shift_left,
    _flat_shift_right,
)
from .pallas_codec3 import (
    D_SHIFT,
    OCC_BIT,
    W2_FLAVORS,
    _INPUT_DTYPE,
    _codes_w2,
    _fwd_transform,
    _last_slot,
    _route_msb,
)
from .pallas_codec4 import (
    _flat_dyn_shift_left,
    _flat_dyn_shift_right,
    _pack_keys_mxu,
    _row_dyn_shift_left,
    _unpack_keys_mxu,
    block_offsets_from_keys_flat,
)

__all__ = ["encode_w2", "decode_w2", "encode_w2_general",
           "decode_w2_general", "block_offsets_from_keys_flat",
           "encode_w2_rows", "decode_w2_rows",
           "encode_w2_rows_flat", "decode_w2_rows_flat",
           "block_offsets_from_keys_rows", "row_stride"]

AG = 4096                 # i8 DMA offset granularity (1-D i8 ref tiling)
AG_ROWS = AG // LANES     # 32

# Test hook: force the decode's two-channel (extras) replay even when the
# token would fit one i32. The split path only triggers naturally at
# slack > 16384 (d_bits > 15) — sizes far too slow for interpret-mode CI.
_FORCE_SPLIT_REPLAY = False

# Replay-regime dispatch (the decode_w2 ``sparse_max`` default):
#   -2  hybrid (PRODUCTION since r5): range-gated dense ladder for blocks
#       with e_sum <= 255 (2*ceil(log2(e_sum)) active stages behind two
#       conds per pass), straight-line ladder above. Chip A/B 2026-08-21
#       (tools/ab_gated_ladder.py): realistic dec ~+10% over the sparse
#       levels (the r4 production path), mixed/pure parity.
#   -1  gated ladder for every replay block (mixed dec ~-10%: the gate
#       conds cost when every group runs anyway).
#    0  straight-line dense ladder only.
#   >0  sparse per-level select for blocks with e_sum <= bound (the r4
#       path: one static shift+select per displacement level — LINEAR in
#       e_sum, which is why the log-depth gated ladder beats it).
SPARSE_REPLAY_MAX = -2


def _lane_psum_mxu(x: jax.Array) -> jax.Array:
    """Within-row inclusive prefix sum of [R,128] via one bf16 MXU matmul
    against a triangular 0/1 matrix. EXACTNESS CONTRACT: operands must be
    bf16-exact integers (<= 256). The MXU accumulates in f32, so row sums up
    to 2^24 stay exact; on this backend a "f32" matmul lowers to a SINGLE
    bf16 pass, so non-bf16-exact operands get truncated (measured: feeding
    16-bit deltas directly round-trips WRONG on chip while passing in
    interpret mode — split wider operands into bytes instead)."""
    xb = x.astype(jnp.bfloat16)
    tri = (jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 0)
           <= jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 1)
           ).astype(jnp.bfloat16)
    return jax.lax.dot_general(xb, tri, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32
                               ).astype(jnp.int32)


def _cross_row_psum(ps: jax.Array) -> jax.Array:
    """Extend within-row inclusive prefix sums to the flat row-major order
    with log2(R) sublane roll/add stages (i32 — no precision constraint).

    A two-level variant (row totals squeezed to (R/128, 128) via one big
    transpose + static lane slices, scanned tiny, mapped back with
    per-group transposes) was built and A/B'd on chip 2026-08-21:
    decode was a wash and encode measured slower — Mosaic transposes cost
    about what the ladder saves. Same-window attribution shows the
    realistic-signal decode gap is the ACTIVE log2(e_sum) routing stages,
    not this scan. Kept as the simple ladder."""
    R = ps.shape[0]
    rt = jnp.broadcast_to(ps[:, LANES - 1:LANES], (R, LANES))
    acc = rt
    shift = 1
    while shift < R:
        ridx = jax.lax.broadcasted_iota(jnp.int32, (R, LANES), 0)
        rs = pltpu.roll(acc, shift, 0)
        acc = acc + jnp.where(ridx >= shift, rs, 0)
        shift <<= 1
    return ps + acc - rt


def _flat_psum_mxu(x: jax.Array) -> jax.Array:
    """Flat inclusive prefix sum for bf16-exact operands (e.g. 0/1 flags)."""
    return _cross_row_psum(_lane_psum_mxu(x))


def _flat_psum_mxu16(x: jax.Array) -> jax.Array:
    """Flat inclusive prefix sum for operands in [0, 2^16): lane psums of
    the lo/hi bytes (each bf16-exact) recombined, one shared cross-row
    pass. Cross-row accumulation wraps mod 2^32 like the VPU scan."""
    lane = _lane_psum_mxu(x & 0xFF) + (_lane_psum_mxu(x >> 8) << 8)
    return _cross_row_psum(lane)


def _route_fwd_disp(chan: jax.Array, d_bits: int, dmax=None,
                    lo: int = 0) -> jax.Array:
    """MSB-first monotone push of a displacement-only channel: occupancy at
    bit 0, displacement at bits [1, 1+d_bits). Empty slots are all-zero.
    This is `_route_msb` minus payload — the decode's forward pass only
    needs to learn WHERE each value's token lands in the stream, so routing
    the displacement field itself replaces codec3/4's mask-recording
    simulation (no mask extraction, packing, or extra live arrays).
    ``lo``: lowest stage index to run (for range-gated callers)."""
    for j in range(d_bits - 1, lo - 1, -1):
        def _stage(chan, j=j):
            rolled = _flat_shift_right(chan, 1 << j)
            bit_rolled = (rolled >> (1 + j)) & 1
            bit_stay = (chan >> (1 + j)) & 1
            return jnp.where(bit_rolled == 1, rolled,
                             jnp.where(bit_stay == 0, chan, 0))

        if dmax is None:
            chan = _stage(chan)
        else:
            chan = jax.lax.cond(dmax >= (1 << j), _stage, lambda c: c, chan)
    return chan


def _route_fwd_disp_grouped(chan: jax.Array, d_bits: int, e_sum,
                            gates=(4, 8)) -> jax.Array:
    """:func:`_route_fwd_disp` with range-gated upper stage groups: stages
    j >= g only matter when displacements can reach 2^g, i.e. e_sum >= 2^g
    (E <= e_sum), so each group sits behind ONE cond — the encode-side
    _route_msb_grouped trick applied to the decode's forward pass. For the
    realistic tier (e_sum 3-15) only stages [min(gates)-1..0] run."""
    def stages(chan, hi, lo):
        for j in range(hi, lo - 1, -1):
            rolled = _flat_shift_right(chan, 1 << j)
            bit_rolled = (rolled >> (1 + j)) & 1
            bit_stay = (chan >> (1 + j)) & 1
            chan = jnp.where(bit_rolled == 1, rolled,
                             jnp.where(bit_stay == 0, chan, 0))
        return chan

    bounds = sorted([g for g in gates if g < d_bits], reverse=True)
    hi = d_bits - 1
    for g in bounds:
        chan = jax.lax.cond(
            e_sum >= (1 << g),
            lambda c, g=g, hi=hi: stages(c, hi, g),
            lambda c: c, chan)
        hi = g - 1
    return stages(chan, hi, 0)


def _reverse_pull_fused_grouped(chan: jax.Array, d_bits: int, e_sum,
                                gates=(4, 8)) -> jax.Array:
    """Mask-free reverse replay with the same range gates (LSB-first, so
    the gated groups come last)."""
    def stages(chan, lo, hi):
        for j in range(lo, hi + 1):
            pulled = _flat_shift_left(chan, 1 << j)
            bit_pulled = (pulled >> (1 + j)) & 1
            bit_stay = (chan >> (1 + j)) & 1
            chan = jnp.where(bit_pulled == 1, pulled,
                             jnp.where(bit_stay == 0, chan, 0))
        return chan

    bounds = sorted([g for g in gates if g < d_bits])
    chan = stages(chan, 0, (bounds[0] - 1) if bounds else d_bits - 1)
    for k, g in enumerate(bounds):
        hi_k = (bounds[k + 1] - 1) if k + 1 < len(bounds) else d_bits - 1
        chan = jax.lax.cond(
            e_sum >= (1 << g),
            lambda c, g=g, hi_k=hi_k: stages(c, g, hi_k),
            lambda c: c, chan)
    return chan


def _reverse_pull_fused(chan: jax.Array, d_bits: int, dmax=None,
                        extras=(), lo: int = 0):
    """Mask-free reverse replay: undo the MSB-first push LSB-first, with
    each token CARRYING its own displacement (bits [1, 1+d_bits)) so no
    recorded masks are needed. In the forward network a token with bit j
    set ALWAYS moves at stage j (monotone displacements make the push
    collision-free), so the exact inverse is: at undo stage j, a slot takes
    the token pulled from ``p + 2^j`` iff that token's bit j is set, keeps
    its own iff its bit j is clear, and empties otherwise. One roll and
    ~5 VPU ops per stage on a single channel — versus the recorded-mask
    replay's forward sim (roll + mask extract/pack) plus two rolls per
    reverse stage — and no mask arrays, which is what capped the general
    decode's block size at 16384.

    ``extras`` are payload-only channels pulled with the same decisions
    (used when payload + displacement exceed 32 bits). ``lo``: lowest
    stage index to run (for range-gated callers — the pull is LSB-first,
    so its upper stages come last)."""
    extras = list(extras)
    for j in range(lo, d_bits):
        def _stage(args, j=j):
            chan, *extras = args
            pulled = _flat_shift_left(chan, 1 << j)
            bit_pulled = (pulled >> (1 + j)) & 1
            bit_stay = (chan >> (1 + j)) & 1
            out = [jnp.where(bit_pulled == 1, pulled,
                             jnp.where(bit_stay == 0, chan, 0))]
            for e in extras:
                ep = _flat_shift_left(e, 1 << j)
                out.append(jnp.where(bit_pulled == 1, ep,
                                     jnp.where(bit_stay == 0, e, 0)))
            return tuple(out)

        if dmax is None:
            chan, *extras = _stage((chan, *extras))
        else:
            chan, *extras = jax.lax.cond(
                dmax >= (1 << j), _stage, lambda args: args,
                (chan, *extras))
    return (chan, *extras)


def _route_msb_grouped(chan: jax.Array, d_bits: int, e_sum,
                       d_shift: int = D_SHIFT) -> jax.Array:
    """MSB-first monotone push with ONE range-gated upper group: stages
    j >= 4 only move tokens when e_sum >= 16, so they sit behind a single
    cond; stages [3..0] always run. Per-stage conds cost more than the
    stages they skip (the round-4 dmax-gating removal), but one range
    cond recovers the data-adaptive skipping for the realistic tier
    (e_sum 3-15 runs 4 of 12 stages). Swept on chip 2026-08-21: one
    split beats three ([..6],[5..4],[3..2]: realistic enc 38.7 vs 41.4,
    mixed 28.2 vs 29.9) and both beat straight-line on realistic
    (~31 GB/s) without hurting mixed or pure."""
    def stages(chan, hi, lo):
        for j in range(hi, lo - 1, -1):
            rolled = _flat_shift_right(chan, 1 << j)
            bit_rolled = (rolled >> (d_shift + j)) & 1
            bit_stay = (chan >> (d_shift + j)) & 1
            chan = jnp.where(bit_rolled == 1, rolled,
                             jnp.where(bit_stay == 0, chan, 0))
        return chan

    hi = d_bits - 1
    for lo in (4,):
        if hi < lo:
            continue
        chan = jax.lax.cond(
            e_sum >= (1 << lo),
            lambda c, hi=hi, lo=lo: stages(c, hi, lo),
            lambda c: c, chan)
        hi = lo - 1
    return stages(chan, hi, 0)


def _ext_bytes(slack: int) -> int:
    """Staging extension beyond the block: slack + alignment headroom,
    rounded so the whole staged span stays a multiple of the i8 tile
    (probed: i8 DMA LENGTHS must be 4096-multiples too)."""
    return -(-(slack + AG) // AG) * AG


def _encode_kernel_factory(d_bits: int, flavor: str, slack: int,
                           split_meta: bool = False, bpr: int = 0,
                           stride: int = 0, grid2d: bool = False,
                           enc_small: bool = True):
    # ``enc_small=False`` restores the r4 single-array grouped routing
    # (measurement hook for tools A/Bs).
    """``bpr``/``stride``: blocks per row and per-row data-region length
    (bytes, an AG multiple) for BATCHED grids — the grid walks rows
    back-to-back and per-row state (offset, previous sample, carry,
    totals) resets at each row boundary, so one pallas_call encodes a
    whole [B, N] batch (one program, full pipelining — the shard_map
    plane's python-per-row loop serialized on dispatch). ``bpr == 0``
    means single-row (grid == nblocks). ``grid2d`` lays the batched grid
    out as (rows, blocks) so the row/block split is two program ids
    instead of a per-step rem/div scalar chain. Probed 2026-08-21
    (tools/ab_rows_encode.py): the 2D grid is ~2x SLOWER than the flat
    rem/div grid — Mosaic pipelines a 1-D grid better — so grid2d stays
    False; the round-3 "batched encode gap" was the XLA relayouts around
    the kernel, not this indexing."""
    def _encode_block_kernel(x_ref, keys_ref, data_ref, total_ref, state_ref,
                             carry_ref, stage_ref, sem):
        RV, _ = x_ref.shape
        V = RV * LANES
        ext_rows = _ext_bytes(slack) // LANES
        if bpr and grid2d:
            row = pl.program_id(0)
            lk = pl.program_id(1)
            k = row * bpr + lk
            nblocks = pl.num_programs(0) * pl.num_programs(1)
            row_last = lk == bpr - 1
            base = row * stride
        else:
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
            state_ref[0] = 0                 # running output byte offset
            state_ref[1] = 0                 # previous sample
            state_ref[2] = 0                 # row overflow accumulator
            carry_ref[:] = jnp.zeros((AG_ROWS, LANES), jnp.int32)

        xi = x_ref[:].astype(jnp.int32)
        if flavor == "zz16":
            xi = xi & 0xFFFF
        v, prev_out = _fwd_transform(flavor, xi, state_ref[1])
        state_ref[1] = prev_out

        c = _codes_w2(v)
        keys_ref[:] = _pack_keys_mxu(c).astype(jnp.uint8)
        e_sum = jnp.sum(c)
        block_len = jnp.minimum(V + e_sum, V + slack)
        # Accumulate the overflow flag in STATICALLY indexed scratch; the
        # per-row (dynamically indexed) output slot is written once at the
        # row boundary below.
        state_ref[2] = state_ref[2] | (e_sum > slack).astype(jnp.int32)

        off = state_ref[0]
        a = off & (AG - 1)
        SR = RV + ext_rows

        def _routed_bytes(v):
            # Straight-line stages, NO per-stage dmax conds: probed on chip
            # 2026-08-21 (tools/ab_gate pattern) — the stage-skipping
            # branches cost more than the stages they skip (Mosaic
            # statically allocates every branch's temporaries; same
            # pathology as the sparse-replay levels). Removing them:
            # incompressible enc 5.0 -> 10.6, sigma200 15.6 -> 26.3,
            # mixed 22.6 -> 32.0, pure enc near-roofline; realistic a
            # wash. The e_sum > 0 trivial-block cond below stays — one
            # branch, and pure-tier blocks skip the whole network.
            E = _flat_psum_mxu(c) - c
            zpad = jnp.zeros((ext_rows, LANES), jnp.int32)
            if split_meta:
                # General variant: displacements up to the full block don't
                # fit the packed word, so occupancy+displacement ride their
                # own channel (bit 0 occupancy, bits [1, 1+d_bits)) and the
                # u16 payload moves as an extra.
                meta = jnp.concatenate([(E << 1) | 1, zpad], axis=0)
                pay = jnp.concatenate([v, zpad], axis=0)
                _, routed = _route_msb(meta, d_bits, extras=[pay],
                                       d_shift=1)
                return (routed & 0xFF) | \
                    ((_flat_shift_right(routed, 1) >> 8) & 0xFF)

            # Compact: the e_sum-gated stage split of _route_msb_grouped,
            # restructured so the low-e_sum branch routes AND extracts on
            # an RV + 8-row array (tokens move <= 15 slots when the upper
            # group is idle) — the decode-side small-array trick applied
            # to encode. Dead branches cost VMEM, not time (r5 probe).
            tok = v | (1 << OCC_BIT) | (E << D_SHIFT)

            def stages(chan, hi, lo):
                for j in range(hi, lo - 1, -1):
                    rolled = _flat_shift_right(chan, 1 << j)
                    bit_rolled = (rolled >> (D_SHIFT + j)) & 1
                    bit_stay = (chan >> (D_SHIFT + j)) & 1
                    chan = jnp.where(bit_rolled == 1, rolled,
                                     jnp.where(bit_stay == 0, chan, 0))
                return chan

            def extract(chan):
                return (chan & 0xFF) | \
                    ((_flat_shift_right(chan, 1) >> 8) & 0xFF)

            def small(tok):
                chan = jnp.concatenate(
                    [tok, jnp.zeros((8, LANES), jnp.int32)], axis=0)
                chan = stages(chan, 3, 0)
                return jnp.concatenate(
                    [extract(chan),
                     jnp.zeros((ext_rows - 8, LANES), jnp.int32)], axis=0)

            def full(tok):
                chan = jnp.concatenate([tok, zpad], axis=0)
                chan = stages(chan, d_bits - 1, 0)
                return extract(chan)

            if not enc_small:
                chan = jnp.concatenate([tok, zpad], axis=0)
                return extract(_route_msb_grouped(chan, d_bits, e_sum))
            return jax.lax.cond(e_sum >= 16, full, small, tok)

        def _trivial_bytes(v):
            return jnp.concatenate(
                [v, jnp.zeros((ext_rows, LANES), jnp.int32)], axis=0)

        data_bytes = jax.lax.cond(e_sum > 0, _routed_bytes, _trivial_bytes, v)
        data_bytes = _flat_dyn_shift_right(data_bytes, a)

        carry_ext = jnp.concatenate(
            [carry_ref[:], jnp.zeros((SR - AG_ROWS, LANES), jnp.int32)],
            axis=0)
        staged = data_bytes | carry_ext

        @pl.when(k != 0)
        def _():
            pltpu.make_async_copy(
                stage_ref, data_ref.at[pl.ds(0, SR * LANES)], sem).wait()
        # Stage as true bytes: cast the 2-D i32 expanded array to i8, then
        # flatten (this direction lowers fine; the reverse needs cast-first).
        stage_ref[:] = staged.astype(jnp.int8).reshape(SR * LANES)

        wa = pl.multiple_of(base + off - a, AG)
        copy = pltpu.make_async_copy(
            stage_ref, data_ref.at[pl.ds(wa, SR * LANES)], sem)
        copy.start()

        @pl.when(k == nblocks - 1)
        def _():
            copy.wait()

        new_off = off + block_len
        tail_rel = (new_off & ~(AG - 1)) - (off - a)   # multiple of AG
        tail = _row_dyn_shift_left(staged, tail_rel)
        na = new_off & (AG - 1)
        cidx = jax.lax.broadcasted_iota(
            jnp.int32, (AG_ROWS, LANES), 0) * LANES + \
            jax.lax.broadcasted_iota(jnp.int32, (AG_ROWS, LANES), 1)
        carry_ref[:] = jnp.where(cidx < na, tail[:AG_ROWS], 0)

        state_ref[0] = new_off

        @pl.when(row_last)
        def _():
            total_ref[2 * row] = new_off
            total_ref[2 * row + 1] = state_ref[2]

    return _encode_block_kernel


@functools.partial(jax.jit,
                   static_argnames=("block", "flavor", "slack",
                                    "enc_small"))
def encode_w2(x: jax.Array, block: int = 32768, flavor: str = "zz16",
              slack: int = 2048, enc_small: bool = True):
    """codec4 ``encode_w2`` with an int8 expanded data section: returns
    ``(key_bytes u8 [N//4], data i8 (one TRUE byte per element), data_len,
    overflow)``."""
    assert flavor in W2_FLAVORS
    N = x.shape[0]
    assert x.dtype == _INPUT_DTYPE[flavor]
    assert N % block == 0 and block % 512 == 0
    assert slack % LANES == 0 and 0 < slack <= block
    d_bits = max(slack.bit_length(), 1)
    split_meta = D_SHIFT + d_bits > 32
    assert 1 + d_bits <= 31
    nblocks = N // block
    RV = block // LANES
    ext = slack
    out_len = N + nblocks * ext + block + _ext_bytes(slack) + 2 * AG

    x2 = x.reshape(N // LANES, LANES)
    KR = RV // 4

    keys, data_x, total = pl.pallas_call(
        _encode_kernel_factory(d_bits, flavor, slack,
                               split_meta=split_meta,
                               enc_small=enc_small),
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
            jax.ShapeDtypeStruct((2,), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.SMEM((3,), jnp.int32),
            pltpu.VMEM((AG_ROWS, LANES), jnp.int32),
            pltpu.VMEM((block + _ext_bytes(slack),), jnp.int8),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(x2)
    return keys.reshape(N // 4), data_x, total[0], total[1]


def encode_w2_general(x: jax.Array, block: int = 65536,
                      flavor: str = "zz16"):
    """Worst-case-safe codec5 encode: slack = block (no overflow possible),
    split-meta routing for the full-block displacement range. ~2x the
    compact variant's per-stage cost; still the int8 data plane + in-kernel
    MXU key pack (vs ~12x slower codec3 general)."""
    keys, data, total, _ovf = encode_w2(x, block=block, flavor=flavor,
                                        slack=block)
    return keys, data, total


def decode_w2_general(keys: jax.Array, data_expanded: jax.Array,
                      block_offsets: jax.Array, block: int = 65536,
                      flavor: str = "zz16"):
    """Inverse of :func:`encode_w2_general` (any well-formed W2 stream —
    block choices are independent between encode and decode; the wire
    format is block-agnostic). The mask-free fused replay carries the
    displacement with each token instead of recording per-stage masks, so
    the VMEM pressure that used to cap this at block 16384 is gone —
    64K blocks (which decode ~2x faster) compile and run."""
    return decode_w2(keys, data_expanded, block_offsets, block=block,
                     flavor=flavor, slack=block)


def _decode_kernel_factory(d_bits: int, flavor: str, slack: int,
                           bpr: int = 0,
                           sparse_max: int = SPARSE_REPLAY_MAX,
                           stub: str = ""):
    # ``stub`` ("dense"/"sparse") replaces that replay branch with a no-op
    # slice — WRONG results for blocks in that regime; measurement hook for
    # quantifying the cost a cond branch's statically allocated temporaries
    # impose on grid steps that never take it (tools/ab_dead_branch.py).
    # Payload (16-bit w) and displacement share one i32 token when
    # 1 + d_bits + 16 <= 32 (slack <= 16384); the general variant
    # (slack = block) pulls w as a separate extras channel.
    # ``bpr``: blocks per row for batched grids — the un-delta scan's
    # carried sample resets at row boundaries; block offsets already
    # carry per-row data-region bases, so nothing else is row-aware.
    def _decode_block_kernel(keys_ref, boff_ref, data_ref, out_ref, state_ref,
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

        # 2-D i8 staging: the data ref is (rows, 128) i8 and windows are
        # row-granular (4096-byte offsets = 32-row multiples, the i8 tile).
        FW_ROWS = (V + _ext_bytes(slack)) // LANES

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

        # Keep the cond's branches i8-only (the raw staged tile) and widen
        # ONCE outside — branch temporaries are statically allocated, so
        # this keeps them 4x smaller (measured a wash in one window, kept
        # for the smaller static footprint). The 2-D i8 tile widens
        # directly (probed fast; the flat-vector widen lowers poorly and
        # the fused reshape+cast crashes).
        fetched = jax.lax.cond(
            even,
            lambda: _take(stage_a, sem_a),
            lambda: _take(stage_b, sem_b),
        ).astype(jnp.int32) & 0xFF
        ext_rows = _ext_bytes(slack) // LANES

        fetched = _flat_dyn_shift_left(fetched, a)

        def _replayed(fetched):
            # Straight-line stages (no per-stage dmax conds) — probed on
            # chip 2026-08-21: the skip branches' static allocation costs
            # more than the stages (mixed dec 12.7 -> 17.8 without them);
            # low-e_sum blocks take the _sparse path anyway. Range-gating
            # the top two stage pairs (the encode trick) was tried here
            # too and measured a wash on mixed with a possible small
            # regression on realistic — reverted.
            w = fetched | ((_flat_shift_left(fetched, 1) & 0xFF) << 8)
            E = _flat_psum_mxu(c) - c
            zeros_rest = jnp.zeros((ext_rows, LANES), jnp.int32)
            chanE = jnp.concatenate([(E << 1) | 1, zeros_rest], axis=0)
            # Forward: land each value's (E, occ) token at its stream slot.
            chanE = _route_fwd_disp(chanE, d_bits)
            # Attach the payload — w is ALREADY stream-indexed (it is the
            # fetched data); hole slots get w with occ=0, which the pull
            # stages never select (their displacement bits read as zero).
            if 1 + d_bits + 16 <= 32 and not _FORCE_SPLIT_REPLAY:
                chan = chanE | (w << (1 + d_bits))
                (chan,) = _reverse_pull_fused(chan, d_bits)
                w16 = (chan >> (1 + d_bits)) & 0xFFFF
            else:
                _, w16 = _reverse_pull_fused(chanE, d_bits,
                                             extras=[w])
            w16 = w16[:RV]
            return (w16 & 0xFF) | (((w16 >> 8) & 0xFF) * c << 8)

        def _replayed_grouped(fetched):
            # The dense ladder with range-gated stage groups (sparse_max
            # == -1/-2): log-depth replay whose ACTIVE depth adapts to
            # e_sum through two conds — the replacement for the
            # linear-in-e_sum sparse levels (tools/ab_gated_ladder.py).
            # Under the HYBRID dispatch this branch only ever serves
            # e_sum <= 255, so the routed arrays span RV + 8 rows
            # (stream <= V + 255 bytes, pulls reach <= 1 row past it)
            # instead of the full RV + ext staging span — ~10% fewer
            # row-units per stage. sparse_max == -1 (gated ladder for
            # EVERY replay block) keeps full-size arrays: its tokens can
            # legitimately move up to the slack budget.
            GROW = 8 if sparse_max == -2 else ext_rows
            f = fetched[:RV + GROW]
            w = f | ((_flat_shift_left(f, 1) & 0xFF) << 8)
            E = _flat_psum_mxu(c) - c
            zeros_rest = jnp.zeros((GROW, LANES), jnp.int32)
            chanE = jnp.concatenate([(E << 1) | 1, zeros_rest], axis=0)
            chanE = _route_fwd_disp_grouped(chanE, d_bits, e_sum)
            assert 1 + d_bits + 16 <= 32
            chan = chanE | (w << (1 + d_bits))
            chan = _reverse_pull_fused_grouped(chan, d_bits, e_sum)
            w16 = ((chan >> (1 + d_bits)) & 0xFFFF)[:RV]
            return (w16 & 0xFF) | (((w16 >> 8) & 0xFF) * c << 8)

        def _sparse(fetched):
            # Sparse per-level select replay: value slot i reads stream
            # slot i + E(i); E is monotone and bounded by e_sum, so one
            # STATIC shift-by-1 + select per displacement level replays
            # the block in sparse_max light stages — no forward routing
            # pass, no token pack/unpack. The realistic fast5 tier (3-15
            # extras per 64K block from read boundaries) lives here; dense
            # blocks keep the 2*log2(e_sum) ladder (_replayed).
            # Straight-line on purpose: per-level lax.conds made Mosaic
            # statically allocate every level's temporaries side by side,
            # slowing EVERY grid step ~linearly in sparse_max even when
            # the branch never ran (probed 2026-08-21: pure-tier decode
            # 47->38 GB/s from sm=0 to sm=10 with gated levels). The
            # incremental shift keeps one live temp.
            w = fetched | ((_flat_shift_left(fetched, 1) & 0xFF) << 8)
            E = _flat_psum_mxu(c) - c
            # Shifts of d <= sparse_max < 128 slots only read one row past
            # the value region; slice once, shift the small array. (A
            # variant hoisting the one-row-down copy out of the loop and
            # doing two direct lane rolls per level measured a wash on
            # chip — Mosaic evidently fuses the chained form's concat.)
            cur = w[:RV + 1]
            res = cur[:RV]
            # Levels are the dominant sparse-path cost (e_sum=1 content ran
            # 39 GB/s at 4 levels vs 21.6 at 16), so the level range is
            # split into quarters with ONE cond gating each upper quarter.
            # Swept on chip 2026-08-21: quarters beat halves beat the
            # straight 16 (realistic dec 21.5 -> 23.5 -> 24.6; e_sum=1
            # content 21.6 -> 29.8 -> 32.8) while EIGHTHS regress
            # (realistic 19.5 — seven conds re-enter the per-level-cond
            # static-allocation pathology).
            q = max(sparse_max // 4, 1)
            bounds = list(range(q, sparse_max, q))

            def _levels(args, lo, hi):
                cur, res = args
                for d in range(lo, hi + 1):
                    cur = _flat_shift_left(cur, 1)
                    res = jnp.where(E == d, cur[:RV], res)
                return cur, res

            cur, res = _levels((cur, res), 1, bounds[0] if bounds
                               else sparse_max)
            for k, lo in enumerate(bounds):
                hi = bounds[k + 1] if k + 1 < len(bounds) else sparse_max
                cur, res = jax.lax.cond(
                    e_sum > lo,
                    lambda args, lo=lo, hi=hi: _levels(args, lo + 1, hi),
                    lambda args: args, (cur, res))
            return (res & 0xFF) | (((res >> 8) & 0xFF) * c << 8)

        if stub == "dense":
            _replayed = lambda f: f[:RV]  # noqa: E731
        elif stub == "sparse":
            _sparse = lambda f: f[:RV]  # noqa: E731

        if stub.startswith("probe:"):
            # Attribution probes (tools/ab_dec_attrib.py): straight-line
            # partial pipelines, WRONG output, constant downstream cost —
            # pairwise deltas give per-component times.
            mode = stub.split(":", 1)[1]
            if mode == "none":
                vals = fetched[:RV]
            else:
                E = _flat_psum_mxu(c) - c
                if mode == "psum":
                    vals = fetched[:RV] | (E & 1)
                else:
                    w = fetched | ((_flat_shift_left(fetched, 1)
                                    & 0xFF) << 8)
                    if mode == "asm":
                        vals = w[:RV] | (E & 1)
                    else:
                        K = int(mode[3:])   # "lvlK": K select levels
                        cur = w[:RV + 1]
                        res = cur[:RV]
                        for d in range(1, K + 1):
                            cur = _flat_shift_left(cur, 1)
                            res = jnp.where(E == d, cur[:RV], res)
                        vals = res
        else:
            # All-code-0 block: every byte at slot i IS value i — no
            # candidate assembly, no replay.
            can_group = 1 + d_bits + 16 <= 32 and not _FORCE_SPLIT_REPLAY
            if sparse_max == -1 and can_group:
                replay = _replayed_grouped
            elif sparse_max == -2 and can_group:
                # Hybrid (production default since r5): gated ladder for
                # the low-e_sum regimes (chip A/B: realistic dec +13%
                # over the sparse levels), straight-line ladder above
                # (the gate conds cost ~15% on mixed when every group
                # runs anyway).
                replay = lambda f: jax.lax.cond(  # noqa: E731
                    e_sum <= 255, _replayed_grouped, _replayed, f)
            elif sparse_max > 0:
                replay = lambda f: jax.lax.cond(  # noqa: E731
                    e_sum <= sparse_max, _sparse, _replayed, f)
            else:
                replay = _replayed
            vals = jax.lax.cond(e_sum > 0, replay,
                                lambda f: f[:RV], fetched)

        u = jax.lax.bitcast_convert_type(vals, jnp.uint32)
        neg = jnp.uint32(0) - (u & 1)
        if flavor == "zz16":
            delta = jax.lax.bitcast_convert_type(
                ((u >> 1) ^ neg) & 0xFFFF, jnp.int32)
            # deltas are 16-bit two's-complement residues in [0, 2^16); the
            # scan only needs acc mod 2^16 (byte-split MXU lane psums).
            acc = _flat_psum_mxu16(delta) + state_ref[0]
            out16 = acc & 0xFFFF
            out_ref[:] = out16.astype(jnp.uint16).astype(jnp.int16)
            state_ref[0] = _last_slot(out16)
        else:  # zz8
            # Only acc mod 2^8 reaches the output, so the un-delta rides
            # the byte-plane MXU psum (operands <= 255, bf16-exact; row
            # sums < 2^24) instead of the VPU roll ladder — the "zz8
            # un-delta MXU psum" round-3 candidate, closed in round 5.
            delta8 = jax.lax.bitcast_convert_type(
                ((u >> 1) ^ neg) & 0xFF, jnp.int32)
            acc = _flat_psum_mxu(delta8) + state_ref[0]
            out8 = acc & 0xFF
            out_ref[:] = out8.astype(jnp.uint8).astype(jnp.int8)
            state_ref[0] = _last_slot(out8)

    return _decode_block_kernel


@functools.partial(jax.jit,
                   static_argnames=("block", "flavor", "slack",
                                    "sparse_max", "stub"))
def decode_w2(keys: jax.Array, data_expanded: jax.Array,
              block_offsets: jax.Array, block: int = 32768,
              flavor: str = "zz16", slack: int = 2048,
              sparse_max: int = SPARSE_REPLAY_MAX, stub: str = ""):
    """Inverse of :func:`encode_w2`; ``data_expanded`` holds one true byte
    per element (i8/u8). Caller contract as codec4. ``sparse_max`` bounds
    the sparse per-level replay regime (0 forces the dense ladder).
    ``stub`` is a measurement-only hook (see ``_decode_kernel_factory``)."""
    assert flavor in W2_FLAVORS
    assert -2 <= sparse_max < LANES  # -1: gated ladder; -2: hybrid
    N = keys.shape[0] * 4
    assert N % block == 0 and block % 512 == 0
    assert slack % LANES == 0 and 0 < slack <= block
    d_bits = max(slack.bit_length(), 1)
    nblocks = N // block
    RV = block // LANES
    ext = slack

    need = N + nblocks * ext + block + _ext_bytes(slack) + 2 * AG
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

    out = pl.pallas_call(
        _decode_kernel_factory(d_bits, flavor, slack,
                               sparse_max=sparse_max, stub=stub),
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
            pltpu.VMEM(((block + _ext_bytes(slack)) // LANES, LANES),
                       jnp.int8),
            pltpu.VMEM(((block + _ext_bytes(slack)) // LANES, LANES),
                       jnp.int8),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(keys2, block_offsets.astype(jnp.int32), data2)
    return out.reshape(N)


# ---------------------------------------------------------------------------
# Batched-grid variants: one pallas_call over a whole [B, N] batch
# ---------------------------------------------------------------------------


def _row_stride(N: int, block: int, slack: int) -> int:
    nb = N // block
    out_len = N + nb * slack + block + _ext_bytes(slack) + 2 * AG
    return -(-out_len // AG) * AG


def row_stride(N: int, block: int, slack: int) -> int:
    """Public alias: the batched data layout's per-row byte region."""
    return _row_stride(N, block, slack)


@functools.partial(jax.jit,
                   static_argnames=("batch", "block", "flavor", "slack",
                                    "grid2d"))
def encode_w2_rows_flat(x2: jax.Array, batch: int, block: int = 65536,
                        flavor: str = "zz16", slack: int = 2048,
                        grid2d: bool = False):
    """Encode a ``batch``-row batch given FLAT as ``(batch*N//128, 128)``
    (row-major — exactly the kernel's native layout): one kernel program,
    the grid walks rows back-to-back with per-row state resets.

    Returns ``(keys u8 (batch*N//512, 128), data i8 (batch*stride,),
    data_lens i32 [batch], overflow i32 [batch])`` — all in the kernel's
    own output layouts, NO XLA reshapes anywhere. This is the production
    entry: the round-3 "batched encode gap" (batched 2-3x slower than
    per-row calls) was entirely the XLA relayouts around the kernel —
    [B, N] i16 -> (B*N/128, 128) on the input and the [B, ...] reshapes
    on the outputs — not the kernel (probed 2026-08-21, ab_rows_encode:
    per-row 64, rows-from-[B,N] 19-70, rows-flat B=4 121 GB/s within one
    window). Callers keep the flat layout end to end (NumPy reshapes on
    the host are free views).

    ``grid2d=True`` uses a (rows, blocks) grid — measured ~2x slower
    than the flat rem/div grid, kept for A/B only."""
    assert flavor in W2_FLAVORS
    R, lanes = x2.shape
    assert lanes == LANES and x2.dtype == _INPUT_DTYPE[flavor]
    B = batch
    assert R % B == 0
    N = R // B * LANES
    assert N % block == 0 and block % 512 == 0
    assert slack % LANES == 0 and 0 < slack <= block
    d_bits = max(slack.bit_length(), 1)
    split_meta = D_SHIFT + d_bits > 32
    nb = N // block
    RV = block // LANES
    stride = _row_stride(N, block, slack)
    KR = RV // 4

    if grid2d:
        grid = (B, nb)
        idx = lambda r, j: (r * nb + j, 0)  # noqa: E731
    else:
        grid = (B * nb,)
        idx = lambda i: (i, 0)  # noqa: E731

    keys, data_x, totals = pl.pallas_call(
        _encode_kernel_factory(d_bits, flavor, slack,
                               split_meta=split_meta, bpr=nb, stride=stride,
                               grid2d=grid2d),
        grid=grid,
        in_specs=[pl.BlockSpec((RV, LANES), idx,
                               memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec((KR, LANES), idx,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B * N // 512, LANES), jnp.uint8),
            jax.ShapeDtypeStruct((B * stride,), jnp.int8),
            jax.ShapeDtypeStruct((2 * B,), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.SMEM((3,), jnp.int32),
            pltpu.VMEM((AG_ROWS, LANES), jnp.int32),
            pltpu.VMEM((block + _ext_bytes(slack),), jnp.int8),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(x2)
    t = totals.reshape(B, 2)
    return keys, data_x, t[:, 0], t[:, 1]


@functools.partial(jax.jit,
                   static_argnames=("block", "flavor", "slack", "grid2d"))
def encode_w2_rows(x: jax.Array, block: int = 65536, flavor: str = "zz16",
                   slack: int = 2048, grid2d: bool = False):
    """[B, N]-shaped convenience wrapper around
    :func:`encode_w2_rows_flat`. The in-jit reshapes here are REAL
    relayouts on this backend (~2-3x encode cost — see the flat variant's
    docstring); performance-critical callers use the flat layout."""
    B, N = x.shape
    keys, data_x, lens, ovf = encode_w2_rows_flat(
        x.reshape(B * N // LANES, LANES), B, block=block, flavor=flavor,
        slack=slack, grid2d=grid2d)
    stride = _row_stride(N, block, slack)
    return (keys.reshape(B, N // 4), data_x.reshape(B, stride), lens, ovf)


def block_offsets_from_keys_rows(keys: jax.Array, block: int,
                                 stride: int) -> jax.Array:
    """Flat per-block data offsets for a [B, N//4] key batch, each row
    based at ``row * stride`` (the batched data layout)."""
    B, NK = keys.shape
    kb = keys.astype(jnp.int32)
    extra = (((kb & 3) != 0).astype(jnp.int32)
             + (((kb >> 2) & 3) != 0).astype(jnp.int32)
             + (((kb >> 4) & 3) != 0).astype(jnp.int32)
             + (((kb >> 6) & 3) != 0).astype(jnp.int32))
    bsum = block + extra.reshape(B, -1, block // 4).sum(axis=2)
    offs = jnp.cumsum(bsum, axis=1) - bsum
    offs = offs + stride * jnp.arange(B, dtype=jnp.int32)[:, None]
    return offs.reshape(-1).astype(jnp.int32)


def _block_offsets_from_keys2_flat(keys2: jax.Array, batch: int, block: int,
                                   stride: int) -> jax.Array:
    """Per-block data offsets from the FLAT (batch*N//512, 128) u8 key
    layout (no [B, N//4] relayout): lane-reduce the per-byte extras, then
    tiny (B, nb) shaping only."""
    kb = keys2.astype(jnp.int32)
    extra = (((kb & 3) != 0).astype(jnp.int32)
             + (((kb >> 2) & 3) != 0).astype(jnp.int32)
             + (((kb >> 4) & 3) != 0).astype(jnp.int32)
             + (((kb >> 6) & 3) != 0).astype(jnp.int32))
    per_keyrow = extra.sum(axis=1)                      # (B * N // 512,)
    bsum = block + per_keyrow.reshape(batch, -1, block // 512).sum(axis=2)
    offs = jnp.cumsum(bsum, axis=1) - bsum
    offs = offs + stride * jnp.arange(batch, dtype=jnp.int32)[:, None]
    return offs.reshape(-1).astype(jnp.int32)


@functools.partial(jax.jit,
                   static_argnames=("batch", "block", "flavor", "slack",
                                    "sparse_max"))
def decode_w2_rows_flat(keys2: jax.Array, data_expanded: jax.Array,
                        batch: int, block: int = 65536,
                        flavor: str = "zz16", slack: int = 2048,
                        sparse_max: int = SPARSE_REPLAY_MAX):
    """Inverse of :func:`encode_w2_rows_flat`: ``keys2 (batch*N//512,
    128)`` u8 and ``data_expanded (batch*stride,)`` i8, both in the
    kernels' native layouts; returns ``(batch*N//128, 128)``. Like the
    encode side, this avoids every [B, ...] relayout (host NumPy reshapes
    are free)."""
    assert flavor in W2_FLAVORS
    B = batch
    KRALL, lanes = keys2.shape
    assert lanes == LANES and KRALL % B == 0
    N = KRALL // B * 512
    assert N % block == 0 and block % 512 == 0
    assert slack % LANES == 0 and 0 < slack <= block
    d_bits = max(slack.bit_length(), 1)
    nb = N // block
    RV = block // LANES
    stride = _row_stride(N, block, slack)
    assert data_expanded.shape == (B * stride,), \
        f"want data ({B * stride},), got {data_expanded.shape}"

    boffs = _block_offsets_from_keys2_flat(keys2, B, block, stride)
    data2 = data_expanded.astype(jnp.int8).reshape(-1, LANES)
    KR = RV // 4

    out = pl.pallas_call(
        _decode_kernel_factory(d_bits, flavor, slack, bpr=nb,
                               sparse_max=sparse_max),
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
            pltpu.VMEM(((block + _ext_bytes(slack)) // LANES, LANES),
                       jnp.int8),
            pltpu.VMEM(((block + _ext_bytes(slack)) // LANES, LANES),
                       jnp.int8),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(keys2, boffs, data2)
    return out


@functools.partial(jax.jit,
                   static_argnames=("block", "flavor", "slack",
                                    "sparse_max"))
def decode_w2_rows(keys: jax.Array, data_expanded: jax.Array,
                   block: int = 65536, flavor: str = "zz16",
                   slack: int = 2048,
                   sparse_max: int = SPARSE_REPLAY_MAX):
    """[B, ...]-shaped convenience wrapper around
    :func:`decode_w2_rows_flat` (in-jit relayouts — see the flat
    variant's docstring); returns ``[B, N]``."""
    B, NK = keys.shape
    N = NK * 4
    out = decode_w2_rows_flat(
        keys.reshape(B * N // 512, LANES),
        data_expanded.astype(jnp.int8).reshape(-1), B, block=block,
        flavor=flavor, slack=slack, sparse_max=sparse_max)
    return out.reshape(B, N)
