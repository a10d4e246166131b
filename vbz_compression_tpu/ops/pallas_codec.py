"""Pallas TPU kernels for the StreamVByte hot path (int16 + zig-zag, v0).

The XLA gather-free formulation streams every network stage through HBM;
these kernels run the whole block-local byte compaction inside VMEM, so per
block the only HBM traffic is the input values, the key bytes, and the
packed data words — within a few × of the roofline.

Encode kernel design:
- grid over blocks of ``V`` values, executed sequentially (TPU semantics);
- per block: codes/lengths from the pre-computed zig-zag values, key-byte
  packing (pure arithmetic), and a recursive-doubling byte-pack of the
  block's 1-or-2-byte strings entirely in VMEM;
- the block's packed bytes are appended to the global data section at a
  *byte* offset carried in SMEM. Writes go out word-aligned: the block
  pre-shifts its words by ``offset & 3`` and ORs the previous block's
  partial last word (carried in SMEM) into its first word — so every DMA
  is a full-word copy and blocks never rewrite each other's bytes.
- the final partial word and total length are flushed by the last block.

The kernel works on whole-word lanes (uint32) — byte granularity exists
only in the arithmetic, never in memory addressing, matching the TPU's
vector ISA (this backend executes per-element gathers at ~0.11 G/s, so the
compaction must be expressed as shifts/selects, like the reference's SSSE3
shuffle-LUT kernel is on x86: ``vbz/v0/vbz_streamvbyte_impl_sse3.h:582-609``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pack_pairs(v: jax.Array, lens: jax.Array):
    """[V] u32 values (≤2 bytes each) → [V//2] packed words + pair lengths.

    (Expressed via reshape rather than stride-2 slicing for Mosaic.)"""
    v2 = v.reshape(-1, 2)
    l2 = lens.reshape(-1, 2)
    words = v2[:, 0] | (v2[:, 1] << (8 * l2[:, 0]).astype(jnp.uint32))
    return words, l2[:, 0] + l2[:, 1]


def _merge_ladder(words: jax.Array, lens: jax.Array):
    """In-VMEM recursive doubling until one record remains.

    words: [W] u32 (W power of two); lens: [W] record byte lengths
    (record r occupies words [r*R, (r+1)*R)). Returns (words, total_len).
    """
    W = words.shape[0]
    R = 1
    nrec = lens.shape[0]
    while nrec > 1:
        A = words.reshape(nrec // 2, 2, R)[:, 0, :]
        B = words.reshape(nrec // 2, 2, R)[:, 1, :]
        la = lens.reshape(nrec // 2, 2)[:, 0:1]
        lb = lens.reshape(nrec // 2, 2)[:, 1:2]
        s = (la & 3).astype(jnp.uint32)
        w0 = (la >> 2).astype(jnp.int32)

        zero_col = jnp.zeros((nrec // 2, 1), jnp.uint32)
        B_ext = jnp.concatenate([B, zero_col], axis=1)
        B_prev = jnp.concatenate([zero_col, B], axis=1)
        sh = 8 * s
        rsh = (32 - sh) & 31
        Bs = jnp.where(sh == 0, B_ext, (B_ext << sh) | (B_prev >> rsh))

        pad_n = R - 1
        cur = jnp.concatenate(
            [Bs, jnp.zeros((nrec // 2, pad_n), jnp.uint32)], axis=1) \
            if pad_n else Bs
        shift = 1
        while shift <= R:
            zpad = jnp.zeros((nrec // 2, shift), jnp.uint32)
            shifted = jnp.concatenate([zpad, cur[:, :-shift]], axis=1)
            cur = jnp.where((w0 & shift) != 0, shifted, cur)
            shift <<= 1

        A_ext = jnp.concatenate(
            [A, jnp.zeros((nrec // 2, R), jnp.uint32)], axis=1)
        words = (A_ext | cur).reshape(W)
        lens = (la + lb).reshape(-1)
        R *= 2
        nrec //= 2
    return words, lens[0]


def _encode_block_kernel(zz_ref, keys_ref, data_ref, total_ref, state_ref,
                         stage_ref, sem):
    V = zz_ref.shape[0]
    k = pl.program_id(0)
    nblocks = pl.num_programs(0)

    @pl.when(k == 0)
    def _():
        state_ref[0] = 0  # byte offset of the data section write head
        state_ref[1] = 0  # carried partial word (bytes below offset & 3)

    v = zz_ref[:].astype(jnp.uint32)
    c = (v > 0xFF).astype(jnp.uint32)
    lens = (c + 1).astype(jnp.int32)

    # Key bytes: 4 codes per byte (codes are 0/1 in this width).
    kc = c.reshape(V // 4, 4)
    keys_ref[:] = (kc[:, 0] | (kc[:, 1] << 2) | (kc[:, 2] << 4)
                   | (kc[:, 3] << 6)).astype(jnp.uint8)

    words, block_len = _merge_ladder(*_pack_pairs(v, lens))

    # Align to the running byte offset: shift right by (off & 3) bytes and
    # merge the carried partial word.
    off = state_ref[0]
    carry = state_ref[1]
    s = (off & 3).astype(jnp.uint32)
    W = words.shape[0]
    zero1 = jnp.zeros((1,), jnp.uint32)
    w_ext = jnp.concatenate([words, zero1])
    w_prev = jnp.concatenate([zero1, words])
    sh = 8 * s
    rsh = (32 - sh) & 31
    shifted = jnp.where(sh == 0, w_ext, (w_ext << sh) | (w_prev >> rsh))
    carry_vec = jnp.concatenate(
        [jnp.full((1,), carry, jnp.int32).astype(jnp.uint32),
         jnp.zeros((W,), jnp.uint32)])
    shifted = shifted | carry_vec

    new_off = off + block_len
    is_last = k == nblocks - 1
    # Words fully determined by this block: floor((off+len)/4) - floor(off/4)
    # … we simply write the whole staged region; the next block rewrites the
    # boundary word with the carry merged, and the last block flushes all.
    stage_ref[:] = shifted

    wo = off >> 2
    copy = pltpu.make_async_copy(
        stage_ref, data_ref.at[pl.ds(wo, W + 1)], sem)
    copy.start()
    copy.wait()

    # Carry the (possibly partial) last word for the next block. Extracted
    # with a masked reduction — Mosaic has no dynamic-position extract.
    tail_idx = (new_off >> 2) - wo
    widx = jax.lax.broadcasted_iota(jnp.int32, (W + 1, 1), 0)[:, 0]
    # Mosaic can't reduce unsigned ints — sum the bit pattern as int32
    # (exact: only one lane is nonzero).
    shifted_i32 = jax.lax.bitcast_convert_type(shifted, jnp.int32)
    tail_word = jnp.sum(jnp.where(widx == tail_idx, shifted_i32, 0))
    state_ref[0] = new_off
    state_ref[1] = jnp.where((new_off & 3) == 0, 0, tail_word)

    @pl.when(is_last)
    def _():
        total_ref[0] = new_off


def _split_ladder(words: jax.Array, lens_leaf: jax.Array):
    """In-VMEM recursive halving: one record (whole block) → per-pair words.

    words: [W] u32 holding the block's dense byte run; lens_leaf: [W] byte
    lengths of the leaf records (value pairs). Returns [W] u32 leaf words.
    """
    W = words.shape[0]
    # Length tree, bottom-up.
    tree = [lens_leaf]
    while tree[-1].shape[0] > 1:
        t = tree[-1]
        tree.append(t.reshape(-1, 2).sum(axis=1))

    cur = words.reshape(1, W)
    for level in range(len(tree) - 2, -1, -1):
        la = tree[level].reshape(-1, 2)[:, 0:1]
        nrec, R2 = cur.shape
        R = R2 // 2
        A = cur[:, :R]
        widx = jax.lax.broadcasted_iota(jnp.int32, (1, R), 1)
        full_words = la >> 2
        tail_bytes = (la & 3).astype(jnp.uint32)
        tail_mask = jnp.where(tail_bytes == 0, 0,
                              (jnp.uint32(1) << (8 * tail_bytes)) - 1)
        A = jnp.where(widx < full_words, A,
                      jnp.where(widx == full_words, A & tail_mask, 0))
        # B: shift record left by la bytes (word ladder + funnel).
        w0 = (la >> 2).astype(jnp.int32)
        s = (la & 3).astype(jnp.uint32)
        b = cur
        shift = 1
        while shift <= R:
            zpad = jnp.zeros((nrec, shift), jnp.uint32)
            shifted = jnp.concatenate([b[:, shift:], zpad], axis=1)
            b = jnp.where((w0 & shift) != 0, shifted, b)
            shift <<= 1
        b = b[:, : R + 1] if R + 1 <= R2 else jnp.concatenate(
            [b, jnp.zeros((nrec, 1), jnp.uint32)], axis=1)
        nxt = jnp.concatenate(
            [b[:, 1: R + 1], jnp.zeros((nrec, 1), jnp.uint32)], axis=1)[:, :R]
        bmain = b[:, :R]
        sh = 8 * s
        lsh = (32 - sh) & 31
        B = jnp.where(sh == 0, bmain, (bmain >> sh) | (nxt << lsh))
        cur = jnp.stack([A, B], axis=1).reshape(2 * nrec, R)
    return cur.reshape(W)


def _prefix_sum_u16(x: jax.Array):
    """Log-shift inclusive prefix sum (the whole-block generalization of the
    reference's 8-wide alignr/add ladder, sse3.h:524-539)."""
    n = x.shape[0]
    shift = 1
    while shift < n:
        pad = jnp.zeros((shift,), x.dtype)
        x = x + jnp.concatenate([pad, x[:-shift]])
        shift <<= 1
    return x


def _decode_block_kernel(keys_ref, boff_ref, data_hbm, out_ref, state_ref,
                         stage_ref, sem):
    Vq = keys_ref.shape[0]          # V // 4 key bytes
    V = Vq * 4
    W = V // 2
    k = pl.program_id(0)

    @pl.when(k == 0)
    def _():
        state_ref[0] = 0  # carried previous int16 value (as int32)

    kb = keys_ref[:].astype(jnp.uint32)
    codes = jnp.stack([kb & 3, (kb >> 2) & 3, (kb >> 4) & 3, (kb >> 6) & 3],
                      axis=1).reshape(V)
    lens = (jnp.minimum(codes, 1) + 1).astype(jnp.int32)  # width-2 streams

    # Fetch this block's data span (word-aligned superset) and re-align.
    bo = boff_ref[0]
    wo = bo >> 2
    copy = pltpu.make_async_copy(
        data_hbm.at[pl.ds(wo, W + 2)], stage_ref, sem)
    copy.start()
    copy.wait()
    raw = stage_ref[:]
    s = (bo & 3).astype(jnp.uint32)
    sh = 8 * s
    lsh = (32 - sh) & 31
    nxt = jnp.concatenate([raw[1:], jnp.zeros((1,), jnp.uint32)])
    aligned = jnp.where(sh == 0, raw, (raw >> sh) | (nxt << lsh))[:W]

    # Zero everything beyond this block's byte length — the DMA over-reads
    # into the next block and the split ladder requires zeros past the end.
    blen = jnp.sum(lens)
    widx = jax.lax.broadcasted_iota(jnp.int32, (W, 1), 0)[:, 0]
    tail = (blen & 3).astype(jnp.uint32)
    tmask = jnp.where(tail == 0, 0, (jnp.uint32(1) << (8 * tail)) - 1)
    aligned = jnp.where(widx < (blen >> 2), aligned,
                        jnp.where(widx == (blen >> 2), aligned & tmask, 0))

    pair_lens = lens.reshape(-1, 2)
    leaf_lens = pair_lens[:, 0] + pair_lens[:, 1]
    leaves = _split_ladder(aligned, leaf_lens)

    l0 = pair_lens[:, 0]
    m0 = jnp.where(l0 == 0, 0,
                   (jnp.uint32(1) << (8 * jnp.minimum(l0, 2)).astype(jnp.uint32)) - 1)
    v0 = leaves & m0
    v1 = leaves >> (8 * l0).astype(jnp.uint32)
    vals = jnp.stack([v0, v1], axis=1).reshape(V)

    # Un-zig-zag (16-bit semantics) + prefix sum + carry.
    v16 = (vals & 0xFFFF).astype(jnp.uint32)
    neg = jnp.uint32(0) - (v16 & 1)  # 0 or 0xFFFFFFFF (modular)
    delta = ((v16 >> 1) ^ neg) & 0xFFFF
    acc = _prefix_sum_u16(delta.astype(jnp.int32)) + state_ref[0]
    out16 = (acc & 0xFFFF).astype(jnp.uint32)
    out_ref[:] = out16.astype(jnp.uint16).astype(jnp.int16)
    state_ref[0] = (acc[V - 1] & 0xFFFF).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("block",))
def decode_int16_zz(keys: jax.Array, data_words: jax.Array,
                    block_offsets: jax.Array, block: int = 2048):
    """Inverse of :func:`encode_int16_zz` for well-formed width-2 streams.

    keys: u8 [N//4]; data_words: u32 (data section, word-aligned, ≥ 2 words
    padding); block_offsets: i32 [nblocks] byte offset of each block's data.
    Returns int16 [N].
    """
    N = keys.shape[0] * 4
    assert N % block == 0
    nblocks = N // block
    W = block // 2

    # Every block DMAs a W+2-word superset of its span; pad so the last
    # block's read stays in bounds.
    need = N // 2 + W + 4
    if data_words.shape[0] < need:
        data_words = jnp.concatenate(
            [data_words,
             jnp.zeros(need - data_words.shape[0], jnp.uint32)])

    out = pl.pallas_call(
        _decode_block_kernel,
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((block // 4,), lambda i: (i,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1,), lambda i: (i,), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((block,), lambda i: (i,),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N,), jnp.int16),
        scratch_shapes=[
            pltpu.SMEM((1,), jnp.int32),
            pltpu.VMEM((W + 2,), jnp.uint32),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(keys, block_offsets.reshape(nblocks, 1)[:, 0] if block_offsets.ndim > 1
      else block_offsets, data_words)
    return out


@functools.partial(jax.jit, static_argnames=("block",))
def encode_int16_zz(zz: jax.Array, block: int = 2048):
    """StreamVByte v0 pack of pre-zig-zagged uint32 values (all < 65536).

    zz: [N] uint32, N a multiple of ``block``. Returns
    ``(key_bytes u8 [N//4], data_words u32 [N//2 + pad], data_len)``.
    The caller assembles ``keys[:key_len] ++ data_bytes[:data_len]``.
    """
    N = zz.shape[0]
    assert N % block == 0
    nblocks = N // block
    W = block // 2

    keys, data, total = pl.pallas_call(
        _encode_block_kernel,
        grid=(nblocks,),
        in_specs=[pl.BlockSpec((block,), lambda i: (i,),
                               memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec((block // 4,), lambda i: (i,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((N // 4,), jnp.uint8),
            jax.ShapeDtypeStruct((N // 2 + W + 2,), jnp.uint32),
            jax.ShapeDtypeStruct((1,), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.SMEM((2,), jnp.int32),
            pltpu.VMEM((W + 1,), jnp.uint32),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(zz.astype(jnp.uint32))
    return keys, data, total[0]
