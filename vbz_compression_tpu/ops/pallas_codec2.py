"""Pallas TPU codec kernels, v2 — Mosaic-constrained butterfly routing.

Expresses the StreamVByte byte compaction with only the op set this backend
supports (probed): 2-D (rows, 128) arrays, lane/sublane rolls, concats,
selects, iota, flat-preserving reshapes. No gathers, no scatters, no
strided lanes, no small-trailing-dim reshapes.

Core algorithm — monotone butterfly routing (MSB-first push):
an element at slot ``p`` with rightward displacement ``d[p]`` (monotone
nondecreasing, injective targets) moves by ``2^j`` at stage ``j`` (MSB→LSB)
iff bit ``j`` of its carried ``d`` is set; monotonicity of the high-bits
function makes every stage collision-free (validated in tests and against
the oracle). For StreamVByte int16: the lo byte of value ``i`` starts at
slot ``i`` with ``d = E(i)`` (# of 2-byte values before ``i``), the hi byte
at slot ``i`` with ``d = E(i)+1``; OR-ing the two routed streams yields the
dense data section. Decode forward-simulates the displacement channel to
record per-stage masks, then replays them in reverse to pull bytes back.

IO convention: the kernels exchange the data section as one *byte per i32
element* ("expanded" layout) so every dynamic-offset DMA is element-aligned;
the 4× denser wire bytes are packed/unpacked by cheap XLA elementwise passes
outside the kernel. This sidesteps Mosaic's unsupported byte-granular DMA
and in-register byte/word transposes.

This is the TPU counterpart of the reference's SSSE3 shuffle-LUT compaction
(``vbz/v0/vbz_streamvbyte_impl_sse3.h:582-609``): where SSE permutes 16
bytes per LUT shuffle, the VPU routes 4096-slot blocks through a 13-stage
select network.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
D_SHIFT = 16  # payload byte in bits [0,8); displacement in bits [16,16+13)
D_BITS = 13


def _flat_shift_right(x: jax.Array, k: int) -> jax.Array:
    """Shift a [R, 128] array right by k slots in flattened row-major order,
    filling with zeros."""
    R = x.shape[0]
    if k >= R * LANES:
        return jnp.zeros_like(x)
    rows, lanes = k // LANES, k % LANES
    if rows:
        x = jnp.concatenate(
            [jnp.zeros((rows, LANES), x.dtype), x[:R - rows]], axis=0)
    if lanes == 0:
        return x
    same = pltpu.roll(x, lanes, 1)
    prev = jnp.concatenate(
        [jnp.zeros((1, LANES), x.dtype), x[: R - 1]], axis=0)
    prev = pltpu.roll(prev, lanes, 1)
    lidx = jax.lax.broadcasted_iota(jnp.int32, (R, LANES), 1)
    return jnp.where(lidx >= lanes, same, prev)


def _flat_shift_left(x: jax.Array, k: int) -> jax.Array:
    """Shift a [R, 128] array left by k slots in flattened row-major order,
    filling with zeros."""
    R = x.shape[0]
    if k >= R * LANES:
        return jnp.zeros_like(x)
    rows, lanes = k // LANES, k % LANES
    if rows:
        x = jnp.concatenate(
            [x[rows:], jnp.zeros((rows, LANES), x.dtype)], axis=0)
    if lanes == 0:
        return x
    same = pltpu.roll(x, LANES - lanes, 1)
    nxt = jnp.concatenate(
        [x[1:], jnp.zeros((1, LANES), x.dtype)], axis=0)
    nxt = pltpu.roll(nxt, LANES - lanes, 1)
    lidx = jax.lax.broadcasted_iota(jnp.int32, (R, LANES), 1)
    return jnp.where(lidx < LANES - lanes, same, nxt)


def _flat_prefix_sum_incl(x: jax.Array) -> jax.Array:
    """Inclusive prefix sum over flattened row-major order of [R, 128]."""
    n = x.shape[0] * LANES
    shift = 1
    while shift < n:
        x = x + _flat_shift_right(x, shift)
        shift <<= 1
    return x


def _route_msb(chan: jax.Array) -> jax.Array:
    """MSB-first monotone push routing of a packed channel: payload in the
    low bits, displacement in bits [D_SHIFT, D_SHIFT+D_BITS). Empty slots
    are all-zero; bit 15 marks occupancy."""
    for j in range(D_BITS - 1, -1, -1):
        rolled = _flat_shift_right(chan, 1 << j)
        bit_rolled = (rolled >> (D_SHIFT + j)) & 1
        bit_stay = (chan >> (D_SHIFT + j)) & 1
        chan = jnp.where(bit_rolled == 1, rolled,
                         jnp.where(bit_stay == 0, chan, 0))
    return chan


def _route_msb_masks(d: jax.Array, occupied: jax.Array):
    """Forward-simulate the routing of a displacement channel, returning
    per-stage (moved_in, stayed) masks for reverse replay."""
    chan = ((d << 1) | occupied) * occupied
    masks = []
    for j in range(D_BITS - 1, -1, -1):
        rolled = _flat_shift_right(chan, 1 << j)
        bit_rolled = ((rolled >> (1 + j)) & 1) * (rolled & 1)
        bit_stay = ((chan >> (1 + j)) & 1) * (chan & 1)
        stayed = (chan & 1) * (1 - bit_stay)
        chan = jnp.where(bit_rolled == 1, rolled,
                         jnp.where(bit_stay == 0, chan, 0))
        masks.append((j, bit_rolled, stayed))
    return masks


def _reverse_replay(stream: jax.Array, masks) -> jax.Array:
    """Undo the routing on a data array using saved per-stage masks."""
    x = stream
    for j, moved_in, stayed in reversed(masks):
        pulled = _flat_shift_left(x, 1 << j)
        was_source = _flat_shift_left(moved_in, 1 << j)
        x = jnp.where(stayed == 1, x,
                      jnp.where(was_source == 1, pulled, 0))
    return x


# ---------------------------------------------------------------------------
# Encode
# ---------------------------------------------------------------------------

ALIGN = 1024        # DMA offsets must be hinted multiples of this (probed)
ALIGN_ROWS = ALIGN // LANES


def _dyn_shift_right(x: jax.Array, a, max_bits: int,
                     min_bit: int = 0) -> jax.Array:
    """Flat right-shift by a *traced* amount a ∈ [0, 2^max_bits)."""
    for b in range(min_bit, max_bits):
        x = jnp.where((a >> b) & 1 == 1, _flat_shift_right(x, 1 << b), x)
    return x


def _dyn_shift_left(x: jax.Array, a, max_bits: int,
                    min_bit: int = 0) -> jax.Array:
    for b in range(min_bit, max_bits):
        x = jnp.where((a >> b) & 1 == 1, _flat_shift_left(x, 1 << b), x)
    return x


def _encode_block_kernel(zz_ref, data_ref, total_ref, state_ref, carry_ref,
                         stage_ref, sem):
    RV, _ = zz_ref.shape                  # (V//128, 128)
    V = RV * LANES
    k = pl.program_id(0)
    nblocks = pl.num_programs(0)

    @pl.when(k == 0)
    def _():
        state_ref[0] = 0
        carry_ref[:] = jnp.zeros((ALIGN_ROWS, LANES), jnp.int32)

    v = zz_ref[:].astype(jnp.int32)       # zig-zag values < 65536
    c = (v > 0xFF).astype(jnp.int32)
    E = _flat_prefix_sum_incl(c) - c
    block_len = V + E[RV - 1, LANES - 1] + c[RV - 1, LANES - 1]

    zero_half = jnp.zeros((RV, LANES), jnp.int32)
    lo = (v & 0xFF) | (E << D_SHIFT) | (1 << 15)
    hi = ((v >> 8) | ((E + 1) << D_SHIFT) | (1 << 15)) * c
    lo_r = _route_msb(jnp.concatenate([lo, zero_half], axis=0))
    hi_r = _route_msb(jnp.concatenate([hi, zero_half], axis=0))
    data_bytes = (lo_r | hi_r) & 0xFF     # (2RV, 128): one byte per element

    # The DMA engine requires aligned offsets: write at the ALIGN-floor of
    # the running offset, pre-shifting our bytes by (off % ALIGN) slots and
    # merging the carried tail of the previous block (kept in VMEM).
    off = state_ref[0]
    a = off & (ALIGN - 1)
    SR = 2 * RV + ALIGN_ROWS              # staged rows
    ext = jnp.concatenate(
        [data_bytes, jnp.zeros((ALIGN_ROWS, LANES), jnp.int32)], axis=0)
    shifted = _dyn_shift_right(ext, a, ALIGN.bit_length() - 1)
    carry_ext = jnp.concatenate(
        [carry_ref[:], jnp.zeros((2 * RV, LANES), jnp.int32)], axis=0)
    staged = shifted | carry_ext
    stage_ref[:] = staged.reshape(SR * LANES)

    wa = pl.multiple_of(off - a, ALIGN)
    copy = pltpu.make_async_copy(
        stage_ref, data_ref.at[pl.ds(wa, SR * LANES)], sem)
    copy.start()
    copy.wait()

    # New carry: the partial tail [align_floor(new_off), new_off).
    new_off = off + block_len
    tail_rel = (new_off & ~(ALIGN - 1)) - (off - a)  # multiple of ALIGN
    tail = _dyn_shift_left(staged, tail_rel, (SR * LANES).bit_length(), min_bit=ALIGN.bit_length() - 1)
    carry_ref[:] = tail[:ALIGN_ROWS]
    # Mask carry beyond (new_off % ALIGN) so future ORs stay clean.
    na = new_off & (ALIGN - 1)
    cidx = jax.lax.broadcasted_iota(jnp.int32, (ALIGN_ROWS, LANES), 0) * \
        LANES + jax.lax.broadcasted_iota(jnp.int32, (ALIGN_ROWS, LANES), 1)
    carry_ref[:] = jnp.where(cidx < na, carry_ref[:], 0)

    state_ref[0] = new_off

    @pl.when(k == nblocks - 1)
    def _():
        total_ref[0] = new_off


@functools.partial(jax.jit, static_argnames=("block",))
def encode_int16_zz(zz: jax.Array, block: int = 2048):
    """StreamVByte v0 pack of pre-zig-zagged values (< 65536).

    zz: [N] uint32/int32; N a multiple of ``block`` (a multiple of 512).
    Returns ``(key_bytes u8 [N//4], data_bytes u8 [2N + pad], data_len)``.
    """
    N = zz.shape[0]
    assert N % block == 0 and block % 512 == 0
    nblocks = N // block
    RV = block // LANES

    zz2 = zz.astype(jnp.int32).reshape(N // LANES, LANES)

    # Key bytes in plain XLA (elementwise + reshape — cheap outside).
    c_all = (zz.astype(jnp.uint32) > 0xFF).astype(jnp.uint32)
    kc = c_all.reshape(N // 4, 4)
    keys = (kc[:, 0] | (kc[:, 1] << 2) | (kc[:, 2] << 4)
            | (kc[:, 3] << 6)).astype(jnp.uint8)

    data_x, total = pl.pallas_call(
        _encode_block_kernel,
        grid=(nblocks,),
        in_specs=[pl.BlockSpec((RV, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((2 * N + 2 * block + 2 * ALIGN,),
                                 jnp.int32),
            jax.ShapeDtypeStruct((1,), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.SMEM((1,), jnp.int32),
            pltpu.VMEM((ALIGN_ROWS, LANES), jnp.int32),
            pltpu.VMEM((2 * block + ALIGN,), jnp.int32),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(zz2)
    return keys, data_x.astype(jnp.uint8), total[0]


# ---------------------------------------------------------------------------
# Decode
# ---------------------------------------------------------------------------


def _decode_block_kernel(c_ref, boff_ref, data_ref, out_ref, state_ref,
                         stage_ref, sem):
    RV = c_ref.shape[0]
    V = RV * LANES
    k = pl.program_id(0)

    @pl.when(k == 0)
    def _():
        state_ref[0] = 0

    c = c_ref[:].astype(jnp.int32)        # hi-byte flags from the keys
    E = _flat_prefix_sum_incl(c) - c

    bo = boff_ref[k]
    a = bo & (ALIGN - 1)
    ra = pl.multiple_of(bo - a, ALIGN)
    copy = pltpu.make_async_copy(
        data_ref.at[pl.ds(ra, 2 * V + ALIGN)], stage_ref, sem)
    copy.start()
    copy.wait()
    fetched = stage_ref[:].reshape(2 * RV + ALIGN_ROWS, LANES)
    data_bytes = _dyn_shift_left(
        fetched, a, ALIGN.bit_length() - 1)[: 2 * RV]

    zero_half = jnp.zeros((RV, LANES), jnp.int32)
    occupied = jnp.concatenate(
        [jnp.ones((RV, LANES), jnp.int32), zero_half], axis=0)
    occ_hi = jnp.concatenate([c, zero_half], axis=0)
    dlo = jnp.concatenate([E, zero_half], axis=0)
    dhi = jnp.concatenate([E + 1, zero_half], axis=0)

    lo_bytes = _reverse_replay(data_bytes,
                               _route_msb_masks(dlo, occupied))[:RV]
    hi_bytes = _reverse_replay(data_bytes,
                               _route_msb_masks(dhi, occ_hi))[:RV] * c
    vals = (lo_bytes & 0xFF) | ((hi_bytes & 0xFF) << 8)

    # Un-zig-zag (16-bit) + prefix sum + carried previous value.
    u = jax.lax.bitcast_convert_type(vals, jnp.uint32)
    neg = jnp.uint32(0) - (u & 1)
    delta = jax.lax.bitcast_convert_type(((u >> 1) ^ neg) & 0xFFFF,
                                         jnp.int32)
    acc = _flat_prefix_sum_incl(delta) + state_ref[0]
    out16 = acc & 0xFFFF
    out_ref[:] = out16.astype(jnp.uint16).astype(jnp.int16)
    ridx = jax.lax.broadcasted_iota(jnp.int32, (RV, LANES), 0)
    lidx = jax.lax.broadcasted_iota(jnp.int32, (RV, LANES), 1)
    state_ref[0] = jnp.sum(
        jnp.where((ridx == RV - 1) & (lidx == LANES - 1), out16, 0))


@functools.partial(jax.jit, static_argnames=("block",))
def decode_int16_zz(keys: jax.Array, data_expanded: jax.Array,
                    block_offsets: jax.Array, block: int = 2048):
    """Inverse of :func:`encode_int16_zz` for well-formed width-2 streams.

    keys: u8 [N//4]; data_expanded: one data-section byte per element
    (any int dtype); block_offsets: i32 [nblocks] per-block byte offsets.
    Returns int16 [N].
    """
    N = keys.shape[0] * 4
    assert N % block == 0 and block % 512 == 0
    nblocks = N // block
    RV = block // LANES

    need = 2 * N + 2 * block + 2 * ALIGN
    data_expanded = data_expanded.astype(jnp.int32)
    if data_expanded.shape[0] < need:
        data_expanded = jnp.concatenate(
            [data_expanded,
             jnp.zeros(need - data_expanded.shape[0], jnp.int32)])

    kb = keys.astype(jnp.uint32)
    codes = jnp.stack([kb & 3, (kb >> 2) & 3, (kb >> 4) & 3,
                       (kb >> 6) & 3], axis=1).reshape(N)
    c_all = jnp.minimum(codes, 1).astype(jnp.int32).reshape(
        N // LANES, LANES)

    out = pl.pallas_call(
        _decode_block_kernel,
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((RV, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((RV, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N // LANES, LANES), jnp.int16),
        scratch_shapes=[
            pltpu.SMEM((1,), jnp.int32),
            pltpu.VMEM((2 * block + ALIGN,), jnp.int32),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(c_all, block_offsets.astype(jnp.int32), data_expanded)
    return out.reshape(N)
