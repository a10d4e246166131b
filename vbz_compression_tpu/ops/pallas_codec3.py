"""Pallas TPU codec kernels, v3 — single-channel butterfly routing, all widths.

Improvements over :mod:`.pallas_codec2`:

- **One routed channel per value instead of one per byte.** A StreamVByte
  value's bytes are contiguous, so the whole little-endian payload is routed
  *once* to the byte slot ``p = i + E(i) + a`` (``E`` = exclusive prefix sum
  of extra byte counts, ``a`` = DMA misalignment, below) and the dense byte
  stream is then assembled with static flat shifts: ``byte[q] |=`` byte ``k``
  of the value landed at ``q-k``. Encode routes one channel (two for the
  4-byte width); v2 routed one per byte.
- **Fused transform.** Encode takes the *raw signal* and computes the
  delta + zig-zag in-kernel (carrying the previous block's last sample in
  SMEM), mirroring the reference's fused SSSE3 loop
  (``vbz/v0/vbz_streamvbyte_impl_sse3.h:424-447``); width semantics follow
  the reference exactly — 16-bit *wrapped* deltas for int16 (the SSE
  specialization), 32-bit deltas for int8/int32 (the generic path,
  ``vbz/v0/vbz_streamvbyte_impl.h:24-34``). Decode fuses the inverse
  (un-zigzag + prefix-sum un-delta + cross-block carry).
- **DMA alignment fused into the routing.** Dynamic-offset DMA requires
  1024-multiple offsets (probed); instead of dynamically shifting staged
  bytes by ``off % ALIGN`` (a 10-stage select ladder), the misalignment is
  *added to every routing displacement*, so bytes land DMA-aligned.
- **Parametric block size.** Displacement needs
  ``ceil(log2(maxd*V + ALIGN))`` bits out of the 15 available
  (bits [17,32) of the channel word; the top one spills into the i32 sign
  bit, harmless since every access masks): blocks to 16384 values for the
  2-byte widths, 8192 for the 4-byte widths.

Channel-word layout::

    bits [0,16)   u16 payload slice (lo | hi<<8)
    bit  16       occupancy
    bits [17,32)  remaining rightward displacement (MSB-first push)

IO stays "expanded" (one data-section byte per i32 element) so dynamic-offset
DMA remains element-aligned; dense u8 packing happens in cheap XLA passes
outside (see pallas_codec2.py module docstring for the rationale).

Flavors (`integer_size`, `use_zigzag`) → (kernel, transform):
    (2, True)  'zz16'   wrapped 16-bit delta + zigzag, W2 kernel [hot path]
    (1, True)  'zz8'    32-bit delta + zigzag (values <= 510), W2 kernel
    (4, True)  'zz32'   wrapped 32-bit delta + zigzag, W4 kernel
    (4, False) 'none32' identity u32, W4 kernel
    (2, False) 'none16' SIGN-EXTENDED identity (1-4 bytes!), W4 kernel
    (1, False) 'none8'  SIGN-EXTENDED identity (1-4 bytes!), W4 kernel
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
    _dyn_shift_left,
    _flat_prefix_sum_incl,
    _flat_shift_left,
    _flat_shift_right,
)

OCC_BIT = 16
D_SHIFT = 17

# DMA offset granularity. A smaller granularity would shrink the typical
# misalignment ``a`` (hence dmax, hence active routing stages), but Mosaic
# PROVES offset divisibility against the HBM ref's tiling: a 1-D i32 ref
# is tiled (1024,), so any A_GRAN < 1024 fails to compile ("Failed to
# prove that a tile index in dimension 0 is divisible by the tiling").
# Probed 2026-08: 256 rejected. Keep == ALIGN.
A_GRAN = ALIGN

# No-zigzag flavors use the 4-byte kernel regardless of input width: the
# reference widens by SIGN-EXTENSION (vbz/v0/vbz_streamvbyte_impl.h:24,
# scalar.widen_values), so negative int8/int16 values encode as 4 bytes.
W2_FLAVORS = ("zz16", "zz8")
W4_FLAVORS = ("zz32", "none32", "none16", "none8")

_INPUT_DTYPE = {"zz16": jnp.int16, "none16": jnp.int16,
                "zz8": jnp.int8, "none8": jnp.int8,
                "zz32": jnp.int32, "none32": jnp.int32}
# Minimum ON-CHIP block: the input/output BlockSpec needs the dtype's full
# sublane tile ((16,128) for i16, (32,128) for i8, (8,128) for i32). The
# kernels themselves accept any multiple of 512 (interpret-mode tests use
# small blocks); integration wrappers must respect MIN_BLOCK on hardware.
MIN_BLOCK = {"zz16": 2048, "none16": 2048, "zz8": 4096, "none8": 4096,
             "zz32": 1024, "none32": 1024}


def _d_bits(block: int, max_extra: int) -> int:
    """Bits for displacement = max_extra*(V-1) + (A_GRAN-1)."""
    return max((max_extra * (block - 1) + A_GRAN - 1).bit_length(), 1)


def _route_msb(chan: jax.Array, d_bits: int, extras=(), dmax=None,
               d_shift: int = D_SHIFT):
    """MSB-first monotone push routing; empty slots are all-zero. ``extras``
    are payload-only arrays moved with the same per-stage decisions.

    ``d_shift``: bit position of the displacement field inside ``chan``
    (defaults to the packed-i32 layout; the i16 variant routes a separate
    meta channel with occupancy at bit 0 and displacement at bit 1).

    ``dmax`` (optional traced scalar): the block's maximum displacement.
    Stages with ``dmax < 2^j`` cannot move anything and are skipped with a
    real branch — on nanopore-like signal almost every value is code 0, so
    per-block displacements are tiny and most stages skip (data-adaptive;
    worst case unchanged)."""
    extras = list(extras)
    for j in range(d_bits - 1, -1, -1):
        def _stage(args, j=j):
            chan, *extras = args
            rolled = _flat_shift_right(chan, 1 << j)
            bit_rolled = (rolled >> (d_shift + j)) & 1
            bit_stay = (chan >> (d_shift + j)) & 1
            chan = jnp.where(bit_rolled == 1, rolled,
                             jnp.where(bit_stay == 0, chan, 0))
            out = [chan]
            for e in extras:
                er = _flat_shift_right(e, 1 << j)
                out.append(jnp.where(bit_rolled == 1, er,
                                     jnp.where(bit_stay == 0, e, 0)))
            return tuple(out)

        if dmax is None:
            chan, *extras = _stage((chan, *extras))
        else:
            chan, *extras = jax.lax.cond(
                dmax >= (1 << j), _stage, lambda args: args,
                (chan, *extras))
    return (chan, *extras)


def _route_msb_masks(d: jax.Array, occupied: jax.Array, d_bits: int,
                     dmax=None):
    """Forward-simulate routing of a displacement channel, returning
    per-stage (moved_in, stayed) masks for reverse replay. With ``dmax``,
    skipped stages yield identity masks via a real branch."""
    chan = ((d << 1) | occupied) * occupied
    masks = []
    for j in range(d_bits - 1, -1, -1):
        def _stage(chan, j=j):
            rolled = _flat_shift_right(chan, 1 << j)
            bit_rolled = ((rolled >> (1 + j)) & 1) * (rolled & 1)
            bit_stay = ((chan >> (1 + j)) & 1) * (chan & 1)
            stayed = (chan & 1) * (1 - bit_stay)
            chan = jnp.where(bit_rolled == 1, rolled,
                             jnp.where(bit_stay == 0, chan, 0))
            return chan, bit_rolled, stayed

        if dmax is None:
            chan, bit_rolled, stayed = _stage(chan)
        else:
            chan, bit_rolled, stayed = jax.lax.cond(
                dmax >= (1 << j), _stage,
                lambda c: (c, jnp.zeros_like(c), jnp.zeros_like(c)), chan)
        masks.append((j, bit_rolled, stayed))
    return masks


def _reverse_replay(streams, masks, dmax=None):
    xs = list(streams)
    for j, moved_in, stayed in reversed(masks):
        def _stage(args, j=j, moved_in=moved_in, stayed=stayed):
            out = []
            was_source = _flat_shift_left(moved_in, 1 << j)
            for x in args:
                pulled = _flat_shift_left(x, 1 << j)
                out.append(jnp.where(stayed == 1, x,
                                     jnp.where(was_source == 1, pulled, 0)))
            return tuple(out)

        if dmax is None:
            xs = list(_stage(tuple(xs)))
        else:
            xs = list(jax.lax.cond(
                dmax >= (1 << j), _stage, lambda args: args, tuple(xs)))
    return xs


def _last_slot(x: jax.Array) -> jax.Array:
    """Value of the last flat slot of a [R, 128] array, as a scalar."""
    R = x.shape[0]
    ridx = jax.lax.broadcasted_iota(jnp.int32, (R, LANES), 0)
    lidx = jax.lax.broadcasted_iota(jnp.int32, (R, LANES), 1)
    return jnp.sum(jnp.where((ridx == R - 1) & (lidx == LANES - 1), x, 0))


# ---------------------------------------------------------------------------
# Fused transforms (encode side; prev carried across blocks in SMEM)
# ---------------------------------------------------------------------------


def _fwd_transform(flavor: str, xi: jax.Array, prev0):
    """Raw widened input + previous sample → zig-zag/identity values, plus
    the value to carry as ``prev`` for the next block."""
    RV = xi.shape[0]
    if flavor in ("none16", "none8", "none32"):
        # Identity over the SIGN-EXTENDED 32-bit widening (scalar.widen_values
        # semantics): xi already arrives sign-extended.
        return xi, jnp.int32(0)
    prev_arr = _flat_shift_right(xi, 1)
    ridx = jax.lax.broadcasted_iota(jnp.int32, (RV, LANES), 0)
    lidx = jax.lax.broadcasted_iota(jnp.int32, (RV, LANES), 1)
    prev_arr = jnp.where((ridx == 0) & (lidx == 0), prev0, prev_arr)
    if flavor == "zz16":
        # 16-bit wrapped delta (sse3.h:431-440 semantics).
        d16 = (xi - prev_arr) & 0xFFFF
        v = ((d16 << 1) & 0xFFFF) ^ ((d16 >> 15) * 0xFFFF)
    else:
        # 32-bit delta (generic path, v0/impl.h:24-34); wraps mod 2^32 for
        # int32, exact for int8 (range ±255 → zigzag ≤ 510).
        d = xi - prev_arr
        v = (d << 1) ^ (d >> 31)
    return v, _last_slot(xi)


def _xla_values(flavor: str, x: jax.Array) -> jax.Array:
    """The same transform in plain XLA (for key-byte computation)."""
    xi = x.astype(jnp.int32)       # sign-extends for int8/int16
    if flavor in ("none16", "none8", "none32"):
        return xi
    prev = jnp.concatenate([jnp.zeros(1, jnp.int32), xi[:-1]])
    if flavor == "zz16":
        xi = xi & 0xFFFF
        prev = prev & 0xFFFF
        d16 = (xi - prev) & 0xFFFF
        return ((d16 << 1) & 0xFFFF) ^ ((d16 >> 15) * 0xFFFF)
    d = xi - prev
    return (d << 1) ^ (d >> 31)


def _codes_w2(v: jax.Array) -> jax.Array:
    return ((v & ~0xFF) != 0).astype(jnp.int32)


def _codes_w4(v: jax.Array) -> jax.Array:
    return (((v & ~0xFF) != 0).astype(jnp.int32)
            + ((v & ~0xFFFF) != 0).astype(jnp.int32)
            + ((v & ~0xFFFFFF) != 0).astype(jnp.int32))


# ---------------------------------------------------------------------------
# Encode — 1/2-byte widths (one routed channel)
# ---------------------------------------------------------------------------


def _encode_kernel_factory(d_bits: int, flavor: str, row_stride: int = 0,
                           slack: int = 0, lanes16: bool = False):
    """``row_stride`` > 0 makes the kernel batched: grid (B, nblocks), each
    row writing its own ``row_stride``-element region of the output.

    ``slack`` > 0 selects the COMPACT variant: the routed array spans only
    V + slack + ALIGN slots (instead of 2V + ALIGN), assuming each block
    emits at most ``slack`` extra bytes. Blocks that exceed it are clamped
    and reported through the overflow flag (last slot of ``total_ref``) —
    the caller re-runs those inputs through the general kernel. On signal
    corpora extra bytes are rare, so the compact network is both shallower
    (fewer displacement bits) and narrower.

    ``lanes16``: route in int16 lanes — two i16 channels (meta: occupancy
    bit 0 + displacement bits [1, 1+d_bits); payload: the u16 value bits)
    instead of one packed i32 channel. Halves the bytes the VPU moves per
    routing stage if Mosaic packs i16 ops 2-per-word. Probed 2026-08: the
    current Mosaic toolchain cannot lower ``tpu.dynamic_rotate`` on non-32-
    bit vectors ("Rotate with non-32-bit data: not implemented"), so this
    variant is interpret-mode-only until the toolchain grows i16 rotates —
    it is kept (and tested) as the ready-made 2x candidate for that day."""
    batched = row_stride > 0

    def _encode_block_kernel(x_ref, data_ref, total_ref, state_ref,
                             carry_ref, stage_ref, sem):
        RV, _ = x_ref.shape                  # (V//128, 128)
        V = RV * LANES
        ext_rows = (slack // LANES if slack else RV) + ALIGN_ROWS
        b = pl.program_id(0) if batched else 0
        k = pl.program_id(1) if batched else pl.program_id(0)
        nblocks = pl.num_programs(1) if batched else pl.num_programs(0)
        nrows = pl.num_programs(0) if batched else 1
        flag_idx = nrows if batched else 1

        @pl.when(k == 0)
        def _():
            state_ref[0] = 0                 # running output byte offset
            state_ref[1] = 0                 # previous sample
            carry_ref[:] = jnp.zeros((ALIGN_ROWS, LANES), jnp.int32)

        @pl.when((k == 0) & (b == 0))
        def _():
            total_ref[flag_idx] = 0          # overflow flag (compact)

        xi = x_ref[:].astype(jnp.int32)
        if flavor == "zz16":
            xi = xi & 0xFFFF
        v, prev_out = _fwd_transform(flavor, xi, state_ref[1])
        state_ref[1] = prev_out

        c = _codes_w2(v)
        E = _flat_prefix_sum_incl(c) - c
        e_last = E[RV - 1, LANES - 1] + c[RV - 1, LANES - 1]
        block_len = V + e_last
        if slack:
            total_ref[flag_idx] = total_ref[flag_idx] | \
                (e_last > slack).astype(jnp.int32)
            block_len = jnp.minimum(block_len, V + slack)

        # Route each value's u16 payload directly to its *DMA-aligned* slot:
        # displacement = data offset E(i) + the block's output misalignment.
        off = state_ref[0]
        a = off & (A_GRAN - 1)
        SR = RV + ext_rows
        dmax = E[RV - 1, LANES - 1] + a   # E is monotone: last slot is max
        if lanes16:
            # Separate i16 meta/payload channels. Both i32→i16 conversions
            # are range-safe: meta ≤ 2*(slack+ALIGN-1)+1 < 2^15 (asserted by
            # the wrapper); payload is mapped to the signed i16 range first.
            meta = (((E + a) << 1) | 1).astype(jnp.int16)
            pay = (v - ((v >> 15) << 16)).astype(jnp.int16)
            zpad = jnp.zeros((ext_rows, LANES), jnp.int16)
            meta = jnp.concatenate([meta, zpad], axis=0)
            pay = jnp.concatenate([pay, zpad], axis=0)
            _, pay_r = _route_msb(meta, d_bits, extras=[pay], dmax=dmax,
                                  d_shift=1)
            data_bytes = ((pay_r & 0xFF)
                          | ((_flat_shift_right(pay_r, 1) >> 8)
                             & 0xFF)).astype(jnp.int32)
        else:
            chan = v | (1 << OCC_BIT) | ((E + a) << D_SHIFT)
            chan = jnp.concatenate(
                [chan, jnp.zeros((ext_rows, LANES), jnp.int32)], axis=0)
            (routed,) = _route_msb(chan, d_bits, dmax=dmax)
            # byte[q] = lo byte landed at q | hi byte of the value at q-1.
            data_bytes = (routed & 0xFF) | \
                ((_flat_shift_right(routed, 1) >> 8) & 0xFF)

        carry_ext = jnp.concatenate(
            [carry_ref[:], jnp.zeros((SR - ALIGN_ROWS, LANES), jnp.int32)],
            axis=0)
        staged = data_bytes | carry_ext

        # Deferred-wait DMA: the copy started at the previous grid step
        # drains while this step's transform/routing runs above; wait only
        # now, just before overwriting the staging buffer. (The chip
        # serializes ~N/block round-trip latencies otherwise — measured as
        # the dominant encode cost.)
        first = (k == 0) & (b == 0) if batched else k == 0
        @pl.when(jnp.logical_not(first))
        def _():
            pltpu.make_async_copy(
                stage_ref, data_ref.at[pl.ds(0, SR * LANES)], sem).wait()
        stage_ref[:] = staged.reshape(SR * LANES)

        wa = pl.multiple_of(b * row_stride + off - a, A_GRAN)
        copy = pltpu.make_async_copy(
            stage_ref, data_ref.at[pl.ds(wa, SR * LANES)], sem)
        copy.start()
        if batched:
            last = (k == nblocks - 1) & (b == pl.num_programs(0) - 1)
        else:
            last = k == nblocks - 1
        @pl.when(last)
        def _():
            copy.wait()

        new_off = off + block_len
        tail_rel = (new_off & ~(A_GRAN - 1)) - (off - a)  # mult of A_GRAN
        tail = _dyn_shift_left(staged, tail_rel,
                               (SR * LANES).bit_length(), min_bit=A_GRAN.bit_length() - 1)
        carry_ref[:] = tail[:ALIGN_ROWS]
        na = new_off & (A_GRAN - 1)
        cidx = jax.lax.broadcasted_iota(
            jnp.int32, (ALIGN_ROWS, LANES), 0) * LANES + \
            jax.lax.broadcasted_iota(jnp.int32, (ALIGN_ROWS, LANES), 1)
        carry_ref[:] = jnp.where(cidx < na, carry_ref[:], 0)

        state_ref[0] = new_off

        @pl.when(k == nblocks - 1)
        def _():
            total_ref[b] = new_off

    return _encode_block_kernel


@functools.partial(jax.jit,
                   static_argnames=("block", "flavor", "slack", "lanes16"))
def encode_w2(x: jax.Array, block: int = 4096, flavor: str = "zz16",
              slack: int | None = None, lanes16: bool = False):
    """Fused transform + StreamVByte v0 pack for the 1/2-byte widths.

    x: [N] int16 (zz16/none16... routed via W4) or int8 (zz8); N a multiple
    of ``block``. Returns ``(key_bytes u8 [N//4], data_expanded i32 (one
    wire byte per element), data_len)`` — plus an ``overflow`` flag when
    ``slack`` is given (compact variant: at most ``slack`` extra bytes per
    block assumed; flag != 0 → re-encode with ``slack=None``).

    ``lanes16``: int16-lane routing (meta+payload i16 channels); requires
    the max displacement to fit 14 bits, i.e. small ``slack``.
    """
    assert flavor in W2_FLAVORS
    N = x.shape[0]
    assert x.dtype == _INPUT_DTYPE[flavor]
    assert N % block == 0 and block % 512 == 0
    if slack is not None:
        assert slack % LANES == 0 and 0 < slack <= block
        d_bits = (slack + A_GRAN - 1).bit_length()
        ext = slack
    else:
        d_bits = _d_bits(block, 1)
        ext = block
    assert D_SHIFT + d_bits <= 32, f"block {block} too large"
    if lanes16:
        assert 1 + d_bits <= 15, "lanes16 needs displacement < 2^14"
    nblocks = N // block
    RV = block // LANES
    out_len = N + nblocks * ext + block + ext + 2 * ALIGN

    x2 = x.reshape(N // LANES, LANES)

    # Key bytes in plain XLA: recompute the transform elementwise (fused by
    # XLA into one cheap pass) and pack 2-bit codes, 4 per byte.
    kc = _codes_w2(_xla_values(flavor, x)).astype(
        jnp.uint32).reshape(N // 4, 4)
    keys = (kc[:, 0] | (kc[:, 1] << 2) | (kc[:, 2] << 4)
            | (kc[:, 3] << 6)).astype(jnp.uint8)

    data_x, total = pl.pallas_call(
        _encode_kernel_factory(d_bits, flavor, slack=slack or 0,
                               lanes16=lanes16),
        grid=(nblocks,),
        in_specs=[pl.BlockSpec((RV, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        out_shape=(
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
    if slack is not None:
        return keys, data_x, total[0], total[1]
    return keys, data_x, total[0]


def encode_int16(x: jax.Array, block: int = 4096):
    """The nanopore hot path: int16 + zigzag (v0)."""
    return encode_w2(x, block=block, flavor="zz16")


# ---------------------------------------------------------------------------
# Decode — 1/2-byte widths
# ---------------------------------------------------------------------------


def _decode_kernel_factory(d_bits: int, flavor: str, row_stride: int = 0,
                           slack: int = 0, lanes16: bool = False):
    """``slack`` > 0 selects the compact variant (callers must have checked
    from the keys that every block's data section fits V + slack bytes).
    ``lanes16``: run the mask simulation + reverse replay in i16 lanes."""
    batched = row_stride > 0

    def _decode_block_kernel(c_ref, boff_ref, data_ref, out_ref, state_ref,
                             stage_a, stage_b, sem_a, sem_b):
        RV = c_ref.shape[0]
        V = RV * LANES
        ext = slack if slack else V
        b = pl.program_id(0) if batched else 0
        k = pl.program_id(1) if batched else pl.program_id(0)
        nblocks = pl.num_programs(1) if batched else pl.num_programs(0)

        @pl.when(k == 0)
        def _():
            state_ref[0] = 0

        c = c_ref[:].astype(jnp.int32)       # hi-byte flags from the keys
        E = _flat_prefix_sum_incl(c) - c

        # Two-buffer prefetch: step g waits on the fetch issued at step g-1
        # and immediately issues the fetch for step g+1 into the other
        # buffer, hiding the DMA round trip behind the replay compute.
        g = b * nblocks + k                   # global grid step
        total_steps = nblocks * (pl.num_programs(0) if batched else 1)
        FW = V + ext + ALIGN                  # fetch window (elements)

        def _start_fetch(step, stage, sem):
            bo_s = boff_ref[step]
            b_s = step // nblocks
            ra_s = pl.multiple_of(
                b_s * row_stride + bo_s - (bo_s & (A_GRAN - 1)), A_GRAN)
            pltpu.make_async_copy(
                data_ref.at[pl.ds(ra_s, FW)], stage, sem).start()

        even = g % 2 == 0

        @pl.when(g == 0)
        def _():
            _start_fetch(g, stage_a, sem_a)

        @pl.when((g + 1 < total_steps) & even)
        def _():
            _start_fetch(g + 1, stage_b, sem_b)

        @pl.when((g + 1 < total_steps) & jnp.logical_not(even))
        def _():
            _start_fetch(g + 1, stage_a, sem_a)

        bo = boff_ref[g]
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

        # Re-assemble each candidate slot's u16: byte[q] | byte[q+1] << 8,
        # then pull the single channel back to source slots. The fetch
        # misalignment ``a`` is fused into the replayed displacements, so
        # the fetched window is used as-is (no dynamic pre-shift).
        w = (fetched & 0xFF) | \
            ((_flat_shift_left(fetched, 1) & 0xFF) << 8)
        dmax = E[RV - 1, LANES - 1] + a
        if lanes16:
            # i16-lane replay: map the u16 candidate words into the signed
            # i16 range (range-safe conversion), simulate + replay in i16,
            # then widen back. Displacements fit 14 bits (wrapper asserts).
            w = (w - ((w >> 15) << 16)).astype(jnp.int16)
            zeros_rest = jnp.zeros((ext_rows, LANES), jnp.int16)
            occupied = jnp.concatenate(
                [jnp.ones((RV, LANES), jnp.int16), zeros_rest], axis=0)
            d = jnp.concatenate(
                [(E + a).astype(jnp.int16), zeros_rest], axis=0)
            [w16] = _reverse_replay(
                [w], _route_msb_masks(d, occupied, d_bits, dmax=dmax),
                dmax=dmax)
            w16 = w16[:RV].astype(jnp.int32) & 0xFFFF
        else:
            zeros_rest = jnp.zeros((ext_rows, LANES), jnp.int32)
            occupied = jnp.concatenate(
                [jnp.ones((RV, LANES), jnp.int32), zeros_rest], axis=0)
            d = jnp.concatenate([E + a, zeros_rest], axis=0)
            [w16] = _reverse_replay(
                [w], _route_msb_masks(d, occupied, d_bits, dmax=dmax),
                dmax=dmax)
            w16 = w16[:RV]
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


@functools.partial(jax.jit,
                   static_argnames=("block", "flavor", "slack", "lanes16"))
def decode_w2(keys: jax.Array, data_expanded: jax.Array,
              block_offsets: jax.Array, block: int = 4096,
              flavor: str = "zz16", slack: int | None = None,
              lanes16: bool = False):
    """Inverse of :func:`encode_w2` for well-formed width-1/2 streams.

    keys: u8 [N//4]; data_expanded: one data-section byte per element (any
    int dtype); block_offsets: i32 [nblocks] per-block byte offsets.
    ``slack``: compact variant — the CALLER must have verified from the keys
    that every block's data section is at most ``block + slack`` bytes.
    ``lanes16``: i16-lane replay (see :func:`encode_w2`).
    Returns the reconstructed signal [N] (int16 or int8 per flavor).
    """
    assert flavor in W2_FLAVORS
    N = keys.shape[0] * 4
    assert N % block == 0 and block % 512 == 0
    if slack is not None:
        assert slack % LANES == 0 and 0 < slack <= block
        d_bits = (slack + A_GRAN - 1).bit_length()
        ext = slack
    else:
        d_bits = _d_bits(block, 1)
        ext = block
    if lanes16:
        assert 1 + d_bits <= 15, "lanes16 needs displacement < 2^14"
    nblocks = N // block
    RV = block // LANES

    need = N + nblocks * ext + block + ext + 2 * ALIGN
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
        _decode_kernel_factory(d_bits, flavor, slack=slack or 0,
                               lanes16=lanes16),
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((RV, LANES), lambda i: (i, 0),
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
    )(c_all, block_offsets.astype(jnp.int32), data_expanded)
    return out.reshape(N)


def decode_int16(keys: jax.Array, data_expanded: jax.Array,
                 block_offsets: jax.Array, block: int = 4096):
    return decode_w2(keys, data_expanded, block_offsets, block=block,
                     flavor="zz16")


# ---------------------------------------------------------------------------
# Encode / decode — 4-byte widths (two payload channels, shared routing)
# ---------------------------------------------------------------------------


def _encode4_kernel_factory(d_bits: int, flavor: str):
    def _encode_block_kernel(x_ref, data_ref, total_ref, state_ref,
                             carry_ref, stage_ref, sem):
        RV, _ = x_ref.shape
        V = RV * LANES
        k = pl.program_id(0)
        nblocks = pl.num_programs(0)

        @pl.when(k == 0)
        def _():
            state_ref[0] = 0
            state_ref[1] = 0
            carry_ref[:] = jnp.zeros((ALIGN_ROWS, LANES), jnp.int32)

        xi = x_ref[:].astype(jnp.int32)   # sign-extends narrow inputs
        v, prev_out = _fwd_transform(flavor, xi, state_ref[1])
        state_ref[1] = prev_out

        code = _codes_w4(v)
        E = _flat_prefix_sum_incl(code) - code
        block_len = V + E[RV - 1, LANES - 1] + code[RV - 1, LANES - 1]

        off = state_ref[0]
        a = off & (A_GRAN - 1)
        SR = 4 * RV + ALIGN_ROWS
        pad = jnp.zeros((3 * RV + ALIGN_ROWS, LANES), jnp.int32)
        chan = (v & 0xFFFF) | (1 << OCC_BIT) | ((E + a) << D_SHIFT)
        chan = jnp.concatenate([chan, pad], axis=0)
        hi16 = jnp.concatenate(
            [(v >> 16) & 0xFFFF, pad], axis=0)
        dmax = E[RV - 1, LANES - 1] + a
        routed, hi_r = _route_msb(chan, d_bits, extras=[hi16], dmax=dmax)
        # byte[q] = byte k of the value landed at q-k (absent bytes are 0
        # in the payload by construction: v < 2^(8*len)).
        data_bytes = ((routed & 0xFF)
                      | ((_flat_shift_right(routed, 1) >> 8) & 0xFF)
                      | (_flat_shift_right(hi_r, 2) & 0xFF)
                      | ((_flat_shift_right(hi_r, 3) >> 8) & 0xFF))

        carry_ext = jnp.concatenate(
            [carry_ref[:], jnp.zeros((4 * RV, LANES), jnp.int32)], axis=0)
        staged = data_bytes | carry_ext
        stage_ref[:] = staged.reshape(SR * LANES)

        wa = pl.multiple_of(off - a, A_GRAN)
        copy = pltpu.make_async_copy(
            stage_ref, data_ref.at[pl.ds(wa, SR * LANES)], sem)
        copy.start()
        copy.wait()

        new_off = off + block_len
        tail_rel = (new_off & ~(A_GRAN - 1)) - (off - a)
        tail = _dyn_shift_left(staged, tail_rel,
                               (SR * LANES).bit_length(), min_bit=A_GRAN.bit_length() - 1)
        carry_ref[:] = tail[:ALIGN_ROWS]
        na = new_off & (A_GRAN - 1)
        cidx = jax.lax.broadcasted_iota(
            jnp.int32, (ALIGN_ROWS, LANES), 0) * LANES + \
            jax.lax.broadcasted_iota(jnp.int32, (ALIGN_ROWS, LANES), 1)
        carry_ref[:] = jnp.where(cidx < na, carry_ref[:], 0)

        state_ref[0] = new_off

        @pl.when(k == nblocks - 1)
        def _():
            total_ref[0] = new_off

    return _encode_block_kernel


@functools.partial(jax.jit, static_argnames=("block", "flavor"))
def encode_w4(x: jax.Array, block: int = 4096, flavor: str = "zz32"):
    """Fused transform + StreamVByte v0 pack over the 4-byte code space.

    x: [N] of the flavor's input dtype (int32, or int16/int8 for the
    sign-extending no-zigzag flavors). Returns ``(key_bytes u8 [N//4],
    data_expanded i32 [4N + pad], data_len)``.
    """
    assert flavor in W4_FLAVORS
    N = x.shape[0]
    assert x.dtype == _INPUT_DTYPE[flavor]
    assert N % block == 0 and block % 512 == 0
    d_bits = _d_bits(block, 3)
    assert D_SHIFT + d_bits <= 32, f"block {block} too large for width 4"
    nblocks = N // block
    RV = block // LANES

    x2 = x.reshape(N // LANES, LANES)
    kc = _codes_w4(_xla_values(flavor, x)).astype(
        jnp.uint32).reshape(N // 4, 4)
    keys = (kc[:, 0] | (kc[:, 1] << 2) | (kc[:, 2] << 4)
            | (kc[:, 3] << 6)).astype(jnp.uint8)

    data_x, total = pl.pallas_call(
        _encode4_kernel_factory(d_bits, flavor),
        grid=(nblocks,),
        in_specs=[pl.BlockSpec((RV, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((4 * N + 4 * block + 2 * ALIGN,),
                                 jnp.int32),
            jax.ShapeDtypeStruct((1,), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.SMEM((2,), jnp.int32),
            pltpu.VMEM((ALIGN_ROWS, LANES), jnp.int32),
            pltpu.VMEM((4 * block + ALIGN,), jnp.int32),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(x2)
    return keys, data_x, total[0]


def _decode4_kernel_factory(d_bits: int, flavor: str):
    def _decode_block_kernel(code_ref, boff_ref, data_ref, out_ref,
                             state_ref, stage_ref, sem):
        RV = code_ref.shape[0]
        V = RV * LANES
        k = pl.program_id(0)

        @pl.when(k == 0)
        def _():
            state_ref[0] = 0

        code = code_ref[:].astype(jnp.int32)
        E = _flat_prefix_sum_incl(code) - code

        bo = boff_ref[k]
        a = bo & (A_GRAN - 1)
        ra = pl.multiple_of(bo - a, A_GRAN)
        copy = pltpu.make_async_copy(
            data_ref.at[pl.ds(ra, 4 * V + ALIGN)], stage_ref, sem)
        copy.start()
        copy.wait()
        fetched = stage_ref[:].reshape(4 * RV + ALIGN_ROWS, LANES)

        w0 = (fetched & 0xFF) | \
            ((_flat_shift_left(fetched, 1) & 0xFF) << 8)
        w1 = (_flat_shift_left(fetched, 2) & 0xFF) | \
            ((_flat_shift_left(fetched, 3) & 0xFF) << 8)
        zeros_rest = jnp.zeros((3 * RV + ALIGN_ROWS, LANES), jnp.int32)
        occupied = jnp.concatenate(
            [jnp.ones((RV, LANES), jnp.int32), zeros_rest], axis=0)
        d = jnp.concatenate([E + a, zeros_rest], axis=0)
        dmax = E[RV - 1, LANES - 1] + a
        lo, hi = _reverse_replay(
            [w0, w1], _route_msb_masks(d, occupied, d_bits, dmax=dmax),
            dmax=dmax)
        lo, hi = lo[:RV], hi[:RV]
        vals = ((lo & 0xFF)
                | (((lo >> 8) & 0xFF) << 8) * (code >= 1).astype(jnp.int32)
                | ((hi & 0xFF) << 16) * (code >= 2).astype(jnp.int32)
                | (((hi >> 8) & 0xFF) << 24) * (code >= 3).astype(jnp.int32))

        if flavor == "none32":
            out_ref[:] = vals
        elif flavor == "none16":
            out_ref[:] = (vals & 0xFFFF).astype(jnp.uint16).astype(jnp.int16)
        elif flavor == "none8":
            out_ref[:] = (vals & 0xFF).astype(jnp.uint8).astype(jnp.int8)
        else:
            u = jax.lax.bitcast_convert_type(vals, jnp.uint32)
            neg = jnp.uint32(0) - (u & 1)
            delta = jax.lax.bitcast_convert_type((u >> 1) ^ neg, jnp.int32)
            acc = _flat_prefix_sum_incl(delta) + state_ref[0]
            out_ref[:] = acc
            state_ref[0] = _last_slot(acc)

    return _decode_block_kernel


@functools.partial(jax.jit, static_argnames=("block", "flavor"))
def decode_w4(keys: jax.Array, data_expanded: jax.Array,
              block_offsets: jax.Array, block: int = 4096,
              flavor: str = "zz32"):
    """Inverse of :func:`encode_w4` for well-formed width-4 streams."""
    assert flavor in W4_FLAVORS
    N = keys.shape[0] * 4
    assert N % block == 0 and block % 512 == 0
    d_bits = _d_bits(block, 3)
    nblocks = N // block
    RV = block // LANES

    need = 4 * N + 4 * block + 2 * ALIGN
    data_expanded = data_expanded.astype(jnp.int32)
    if data_expanded.shape[0] < need:
        data_expanded = jnp.concatenate(
            [data_expanded,
             jnp.zeros(need - data_expanded.shape[0], jnp.int32)])

    kb = keys.astype(jnp.uint32)
    codes = jnp.stack([kb & 3, (kb >> 2) & 3, (kb >> 4) & 3,
                       (kb >> 6) & 3], axis=1).reshape(N)
    c_all = codes.astype(jnp.int32).reshape(N // LANES, LANES)

    out = pl.pallas_call(
        _decode4_kernel_factory(d_bits, flavor),
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((RV, LANES), lambda i: (i, 0),
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
            pltpu.VMEM((4 * block + ALIGN,), jnp.int32),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(c_all, block_offsets.astype(jnp.int32), data_expanded)
    return out.reshape(N)


# ---------------------------------------------------------------------------
# Batched variants (grid over rows × blocks) — feed the sharded data plane
# ---------------------------------------------------------------------------


def _xla_values_2d(flavor: str, x: jax.Array) -> jax.Array:
    """Row-wise transform for [B, N] batches (delta resets per row)."""
    xi = x.astype(jnp.int32)
    if flavor in ("none16", "none8", "none32"):
        return xi
    prev = jnp.concatenate(
        [jnp.zeros((xi.shape[0], 1), jnp.int32), xi[:, :-1]], axis=1)
    if flavor == "zz16":
        xi = xi & 0xFFFF
        prev = prev & 0xFFFF
        d16 = (xi - prev) & 0xFFFF
        return ((d16 << 1) & 0xFFFF) ^ ((d16 >> 15) * 0xFFFF)
    d = xi - prev
    return (d << 1) ^ (d >> 31)


@functools.partial(jax.jit, static_argnames=("block", "flavor"))
def encode_w2_batch(x: jax.Array, block: int = 4096, flavor: str = "zz16"):
    """Batched :func:`encode_w2` over independent rows.

    x: [B, N]. Returns ``(keys u8 [B, N//4], data_expanded i32 [B, STRIDE],
    data_lens i32 [B])`` where ``STRIDE = 2N + 2*block + 2*ALIGN``.
    """
    assert flavor in W2_FLAVORS
    B, N = x.shape
    assert x.dtype == _INPUT_DTYPE[flavor]
    assert N % block == 0 and block % 512 == 0
    d_bits = _d_bits(block, 1)
    assert D_SHIFT + d_bits <= 32
    nblocks = N // block
    RV = block // LANES
    stride = 2 * N + 2 * block + 2 * ALIGN

    x2 = x.reshape(B * N // LANES, LANES)
    kc = _codes_w2(_xla_values_2d(flavor, x)).astype(
        jnp.uint32).reshape(B, N // 4, 4)
    keys = (kc[..., 0] | (kc[..., 1] << 2) | (kc[..., 2] << 4)
            | (kc[..., 3] << 6)).astype(jnp.uint8)

    rows_per_block = N // LANES // nblocks
    data_x, totals = pl.pallas_call(
        _encode_kernel_factory(d_bits, flavor, row_stride=stride),
        grid=(B, nblocks),
        in_specs=[pl.BlockSpec(
            (RV, LANES),
            lambda b, k, rpb=rows_per_block, nb=nblocks: (b * nb + k, 0),
            memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B * stride,), jnp.int32),
            jax.ShapeDtypeStruct((B + 1,), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.SMEM((2,), jnp.int32),
            pltpu.VMEM((ALIGN_ROWS, LANES), jnp.int32),
            pltpu.VMEM((2 * block + ALIGN,), jnp.int32),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(x2)
    return keys, data_x.reshape(B, stride), totals[:B]


@functools.partial(jax.jit, static_argnames=("block", "flavor"))
def decode_w2_batch(keys: jax.Array, data_expanded: jax.Array,
                    block_offsets: jax.Array, block: int = 4096,
                    flavor: str = "zz16"):
    """Batched :func:`decode_w2`.

    keys: u8 [B, N//4]; data_expanded: i32 [B, STRIDE] (one wire byte per
    element, STRIDE as produced by :func:`encode_w2_batch`);
    block_offsets: i32 [B, nblocks] row-local byte offsets.
    Returns [B, N].
    """
    assert flavor in W2_FLAVORS
    B = keys.shape[0]
    N = keys.shape[1] * 4
    assert N % block == 0 and block % 512 == 0
    d_bits = _d_bits(block, 1)
    nblocks = N // block
    RV = block // LANES
    stride = 2 * N + 2 * block + 2 * ALIGN
    assert data_expanded.shape == (B, stride), data_expanded.shape

    kb = keys.astype(jnp.uint32)
    codes = jnp.stack([kb & 3, (kb >> 2) & 3, (kb >> 4) & 3,
                       (kb >> 6) & 3], axis=2).reshape(B, N)
    c_all = jnp.minimum(codes, 1).astype(jnp.int32).reshape(
        B * N // LANES, LANES)

    out = pl.pallas_call(
        _decode_kernel_factory(d_bits, flavor, row_stride=stride),
        grid=(B, nblocks),
        in_specs=[
            pl.BlockSpec((RV, LANES),
                         lambda b, k, nb=nblocks: (b * nb + k, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((RV, LANES),
                               lambda b, k, nb=nblocks: (b * nb + k, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (B * N // LANES, LANES), _INPUT_DTYPE[flavor]),
        scratch_shapes=[
            pltpu.SMEM((1,), jnp.int32),
            pltpu.VMEM((2 * block + ALIGN,), jnp.int32),
            pltpu.VMEM((2 * block + ALIGN,), jnp.int32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(c_all, block_offsets.astype(jnp.int32).reshape(B * nblocks),
      data_expanded.reshape(B * stride))
    return out.reshape(B, N)


def block_offsets_from_keys_batch(keys: jax.Array, block: int) -> jax.Array:
    """Row-local per-block byte offsets for [B, N//4] key batches (W2)."""
    B = keys.shape[0]
    N = keys.shape[1] * 4
    kb = keys.astype(jnp.uint32)
    codes = jnp.stack([kb & 3, (kb >> 2) & 3, (kb >> 4) & 3,
                       (kb >> 6) & 3], axis=2).reshape(B, N)
    lens = (jnp.minimum(codes, 1) + 1).astype(jnp.int32)
    bsum = lens.reshape(B, N // block, block).sum(axis=2)
    return (jnp.cumsum(bsum, axis=1) - bsum).astype(jnp.int32)


# ---------------------------------------------------------------------------
# Helpers
# ---------------------------------------------------------------------------


def block_offsets_from_keys(keys: jax.Array, block: int,
                            four_byte_codes: bool = False) -> jax.Array:
    """Per-block data-section byte offsets, from the key bytes (XLA).

    ``four_byte_codes``: True for the W4 flavors (codes 0-3 → 1-4 bytes);
    False for the W2 flavors (codes 0-1 → 1-2 bytes)."""
    kb = keys.astype(jnp.uint32)
    codes = jnp.stack([kb & 3, (kb >> 2) & 3, (kb >> 4) & 3,
                       (kb >> 6) & 3], axis=1).reshape(-1)
    if four_byte_codes:
        lens = (codes + 1).astype(jnp.int32)
    else:
        lens = (jnp.minimum(codes, 1) + 1).astype(jnp.int32)
    bsum = lens.reshape(-1, block).sum(axis=1)
    return (jnp.cumsum(bsum) - bsum).astype(jnp.int32)
