"""Recursive-doubling byte packer — the fast TPU encode path.

Builds the StreamVByte data section without any scatter and with only a
handful of gathers, by treating the variable-length byte strings of each
value as *records* and concatenating them pairwise in log₂ rounds
("recursive doubling"):

  level 0:  one record per value — its 1..4 data bytes packed in a u32 word
            (2 values per word for ≤2-byte configs);
  level k:  adjacent records merge — the right record's words are shifted by
            the left record's byte length (a byte-granular funnel shift plus
            a binary-decomposed word shift) and OR-ed in. Bytes beyond a
            record's length are zero by induction, so OR is exact.

After K levels, records are dense blocks of 2^K values; the final stream is
assembled by locating each output byte's block via bisection over the small
per-block offset array (≪ values) and extracting the byte from the block's
words — all vectorized gathers into VMEM-resident tables.

This is the TPU-native counterpart of the reference's SSSE3
shuffle-LUT compaction (``vbz/v0/vbz_streamvbyte_impl_sse3.h:582-609``):
where SSE routes bytes through a 16-lane shuffle per 8 values, the VPU
routes 32-bit lanes through log-depth select/shift networks per block.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _exclusive_cumsum(x):
    c = jnp.cumsum(x)
    return c - x


# Below this record count, per-record word placement switches from the
# binary-decomposed conditional-shift ladder (log R full passes) to unrolled
# lax.dynamic_update_slice copies (one bulk memcpy per record) — cheaper when
# records are few and huge (the deep levels of a full-depth pack).
_DYNAMIC_NREC = 16


def _funnel_shift_bytes(B: jax.Array, s: jax.Array):
    """Shift each record's byte string right by s ∈ [0,4) bytes; returns one
    extra word per record. B: [nrec, R]; s: [nrec, 1] uint32."""
    nrec = B.shape[0]
    zero_col = jnp.zeros((nrec, 1), dtype=jnp.uint32)
    B_ext = jnp.concatenate([B, zero_col], axis=1)
    B_prev = jnp.concatenate([zero_col, B], axis=1)
    sh = 8 * s
    rsh = (32 - sh) & 31
    return jnp.where(sh == 0, B_ext, (B_ext << sh) | (B_prev >> rsh))


def _place_at_word_offset(Bs: jax.Array, w0: jax.Array, R: int):
    """Place [nrec, R+1] word strings at per-record word offsets w0 ∈ [0, R]
    within [nrec, 2R] buffers (zero elsewhere)."""
    nrec = Bs.shape[0]
    pad_n = R - 1
    pad = jnp.zeros((nrec, pad_n), dtype=jnp.uint32)
    cur = jnp.concatenate([Bs, pad], axis=1)             # [nrec, 2R]
    if nrec <= _DYNAMIC_NREC:
        rows = []
        # One word wider than the result: at w0 == R the (R+1)-word source
        # would otherwise spill and dynamic_update_slice clamps the start,
        # shifting the whole write.
        zero_row = jnp.zeros((2 * R + 1,), dtype=jnp.uint32)
        for r in range(nrec):
            shifted = jax.lax.dynamic_update_slice(
                zero_row, Bs[r], (w0[r, 0],))
            rows.append(shifted[: 2 * R])
        return jnp.stack(rows)
    shift = 1
    while shift <= R:
        zpad = jnp.zeros((nrec, shift), dtype=jnp.uint32)
        shifted = jnp.concatenate([zpad, cur[:, :-shift]], axis=1)
        cur = jnp.where((w0 & shift) != 0, shifted, cur)
        shift <<= 1
    return cur


def _merge_level(words: jax.Array, lens: jax.Array, R: int):
    """One doubling round: [nrec, R]-word records → [nrec//2, 2R].

    ``lens`` are record byte lengths (≤ 4R by invariant).
    """
    nrec = lens.shape[0]
    A = words.reshape(nrec // 2, 2, R)[:, 0, :]
    B = words.reshape(nrec // 2, 2, R)[:, 1, :]
    la = lens.reshape(nrec // 2, 2)[:, 0:1]  # [nrec/2, 1]
    lb = lens.reshape(nrec // 2, 2)[:, 1:2]

    s = (la & 3).astype(jnp.uint32)          # byte shift within word
    w0 = (la >> 2).astype(jnp.int32)         # word offset of B in the result

    Bs = _funnel_shift_bytes(B, s)
    cur = _place_at_word_offset(Bs, w0, R)

    zpadA = jnp.zeros((nrec // 2, R), dtype=jnp.uint32)
    A_ext = jnp.concatenate([A, zpadA], axis=1)
    return (A_ext | cur).reshape(-1), (la + lb).reshape(-1)


@functools.partial(jax.jit, static_argnames=("max_bytes", "block_values"))
def pack_blocks(values: jax.Array, lengths: jax.Array, max_bytes: int = 4,
                block_values: int = 256):
    """Pack per-value byte strings into dense per-block byte runs.

    values: uint32 [N] (bytes beyond ``lengths`` must be zero — true for
    StreamVByte minimal-length encodings). lengths: int32 [N] in [0, max_bytes].

    Returns ``(block_words [nblocks, BW] u32, block_lens [nblocks] i32)`` where
    ``BW = block_values * max_bytes / 4``.
    """
    N = values.shape[0]
    assert N % block_values == 0
    v = values.astype(jnp.uint32)
    lens = lengths.astype(jnp.int32)

    if max_bytes <= 2:
        # Two values per initial record: v0 | v1 << 8*l0 (l0+l1 ≤ 4).
        v0 = v[0::2]
        v1 = v[1::2]
        l0 = lens[0::2]
        words = v0 | (v1 << (8 * l0).astype(jnp.uint32))
        lens = l0 + lens[1::2]
        R = 1
        nvals_per_rec = 2
    else:
        words = v
        R = 1
        nvals_per_rec = 1

    while nvals_per_rec < block_values:
        words, lens = _merge_level(words, lens, R)
        R *= 2
        nvals_per_rec *= 2

    BW = block_values * max_bytes // 4
    assert R == BW, (R, BW)
    return words.reshape(-1, BW), lens


@functools.partial(jax.jit, static_argnames=("max_bytes",))
def pack_full(values: jax.Array, lengths: jax.Array, max_bytes: int = 4):
    """Pack the whole array into ONE dense byte run (full-depth doubling).

    Returns ``(words u32 [W], data_len)`` with the data section's bytes in
    little-endian order from word 0. Gather-free: deep levels use unrolled
    dynamic-slice placement, shallow levels the conditional-shift ladder.
    """
    N = values.shape[0]
    v = values.astype(jnp.uint32)
    lens = lengths.astype(jnp.int32)

    if max_bytes <= 2:
        v0 = v[0::2]
        v1 = v[1::2]
        l0 = lens[0::2]
        words = v0 | (v1 << (8 * l0).astype(jnp.uint32))
        lens = l0 + lens[1::2]
        R = 1
    else:
        words = v
        R = 1

    while lens.shape[0] > 1:
        words, lens = _merge_level(words, lens, R)
        R *= 2
    return words, lens[0]


@functools.partial(jax.jit, static_argnames=("out_len",))
def assemble_stream(key_bytes: jax.Array, key_len: jax.Array,
                    data_words: jax.Array, data_len: jax.Array,
                    out_len: int):
    """Gather-free final assembly: ``keys[:key_len] ++ data[:data_len]``.

    The data section is materialized as bytes via bitcast and placed at the
    dynamic ``key_len`` offset with a single dynamic-slice of a zero-padded
    buffer (memcpy-speed; no per-byte indexing).
    """
    nk = key_bytes.shape[0]
    data_bytes = jax.lax.bitcast_convert_type(
        data_words, jnp.uint8).reshape(-1)          # little-endian per word
    W4 = data_bytes.shape[0]
    # Shift data right by key_len: take a dynamic slice of [zeros | data]
    # starting at (nk - key_len) so data lands at key_len.
    buf = jnp.concatenate(
        [jnp.zeros(nk, jnp.uint8), data_bytes,
         jnp.zeros(max(out_len - W4, 0), jnp.uint8)])
    shifted = jax.lax.dynamic_slice(buf, (nk - key_len,), (out_len,))
    p = jnp.arange(out_len, dtype=jnp.int32)
    keys_padded = jnp.concatenate(
        [key_bytes, jnp.zeros(max(out_len - nk, 0), jnp.uint8)])[:out_len]
    total = key_len + data_len
    out = jnp.where(p < key_len, keys_padded, shifted)
    return jnp.where(p < total, out, 0), total


@functools.partial(jax.jit, static_argnames=("out_len",))
def splice_blocks(key_bytes: jax.Array, key_len: jax.Array,
                  block_words: jax.Array, block_lens: jax.Array,
                  out_len: int):
    """Assemble ``keys ++ concat(blocks)`` into a flat uint8 stream.

    Per output byte: bisect the (small) block-offset table, then extract the
    byte from the owning block's words.
    """
    nblocks, BW = block_words.shape
    S = _exclusive_cumsum(block_lens)                   # block byte offsets
    data_len = S[-1] + block_lens[-1]
    total_len = key_len + data_len

    p = jnp.arange(out_len, dtype=jnp.int32)
    j = jnp.maximum(p - key_len, 0)

    lo = jnp.zeros(out_len, dtype=jnp.int32)
    hi = jnp.full(out_len, nblocks - 1, dtype=jnp.int32)
    for _ in range(max(nblocks.bit_length() - 1, 1)):
        mid = (lo + hi + 1) >> 1
        pred = S[jnp.clip(mid, 0, nblocks - 1)] <= j
        lo = jnp.where(pred, mid, lo)
        hi = jnp.where(pred, hi, mid - 1)
    b = jnp.clip(lo, 0, nblocks - 1)
    t = j - S[b]
    flat = block_words.reshape(-1)
    word = flat[jnp.clip(b * BW + (t >> 2), 0, nblocks * BW - 1)]
    data_byte = ((word >> (8 * (t & 3)).astype(jnp.uint32)) & 0xFF
                 ).astype(jnp.uint8)

    nk = key_bytes.shape[0]
    key_byte = key_bytes[jnp.minimum(p, nk - 1)]
    out = jnp.where(p < key_len, key_byte, data_byte)
    return jnp.where(p < total_len, out, 0), total_len
