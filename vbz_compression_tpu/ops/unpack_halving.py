"""Recursive-halving byte unpacker — the gather-free TPU decode path.

Inverse of :mod:`.pack_doubling`: the StreamVByte data section is one dense
byte run; per-value byte lengths are known *before* touching the data (they
come from the key section, which expands gather-free via repeat/reshape).
The splitter walks a binary length tree top-down: at each level every record
splits into (A = first ``la`` bytes, B = rest), where B is re-aligned to its
own record slot with a byte-granular funnel shift plus a per-record word
shift (conditional-shift ladder for many records, unrolled dynamic slices
for few). After log₂N levels each record is a single word holding one (or a
pair of) value's bytes.

This replaces the offset-gather decode: on the axon TPU backend gathers run
at ~0.11 G elements/s (scalar-loop speed) while elementwise streams at
~17 G/s — select/shift networks win by two orders of magnitude.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_DYNAMIC_NREC = 16


def _extract_left_shift(words: jax.Array, off_bytes: jax.Array, R: int):
    """For each [nrec, 2R]-word record, return the byte string starting at
    per-record byte offset ``off_bytes`` re-aligned to offset 0 ([nrec, 2R]
    words; caller slices to R+pad as needed)."""
    nrec = words.shape[0]
    w0 = (off_bytes >> 2).astype(jnp.int32)          # [nrec, 1]
    s = (off_bytes & 3).astype(jnp.uint32)

    # Word-level left shift by w0 ∈ [0, 2R].
    if nrec <= _DYNAMIC_NREC:
        rows = []
        for r in range(nrec):
            rows.append(jax.lax.dynamic_slice(
                jnp.concatenate([words[r],
                                 jnp.zeros(2 * R, jnp.uint32)]),
                (w0[r, 0],), (2 * R,)))
        cur = jnp.stack(rows)
    else:
        cur = words
        shift = 1
        while shift <= 2 * R:
            zpad = jnp.zeros((nrec, shift), dtype=jnp.uint32)
            shifted = jnp.concatenate([cur[:, shift:], zpad], axis=1)
            cur = jnp.where((w0 & shift) != 0, shifted, cur)
            shift <<= 1

    # Byte-level funnel left shift by s ∈ [0, 4).
    zero_col = jnp.zeros((nrec, 1), dtype=jnp.uint32)
    nxt = jnp.concatenate([cur[:, 1:], zero_col], axis=1)
    sh = 8 * s
    lsh = (32 - sh) & 31
    return jnp.where(sh == 0, cur, (cur >> sh) | (nxt << lsh))


def _split_level(words: jax.Array, la: jax.Array, R: int):
    """[nrec, 2R]-word records → [2*nrec, R]: A = first la bytes (masked),
    B = the rest re-aligned to offset 0."""
    nrec = words.shape[0]
    A = words[:, :R]
    # Mask A's partial last word and anything beyond la.
    widx = jnp.arange(R, dtype=jnp.int32)[None, :]
    full_words = (la >> 2)
    tail_bytes = (la & 3).astype(jnp.uint32)
    tail_mask = jnp.where(tail_bytes == 0, 0,
                          (jnp.uint32(1) << (8 * tail_bytes)) - 1)
    A = jnp.where(widx < full_words, A,
                  jnp.where(widx == full_words, A & tail_mask, 0))
    B = _extract_left_shift(words, la, R)[:, :R]
    out = jnp.stack([A, B], axis=1).reshape(2 * nrec, R)
    return out


@functools.partial(jax.jit, static_argnames=("max_bytes",))
def unpack_full(data_words: jax.Array, lengths: jax.Array,
                max_bytes: int = 4):
    """Inverse of ``pack_doubling.pack_full``: dense data words + per-value
    byte lengths → uint32 values. Gather-free."""
    N = lengths.shape[0]
    lens = lengths.astype(jnp.int32)

    pair = max_bytes <= 2
    if pair:
        rec_lens = lens[0::2] + lens[1::2]
        n_leaf = N // 2
    else:
        rec_lens = lens
        n_leaf = N

    # Build the length tree bottom-up (record byte lengths per level).
    tree = [rec_lens]
    while tree[-1].shape[0] > 1:
        t = tree[-1]
        tree.append(t.reshape(-1, 2).sum(axis=1))

    W = data_words.shape[0]
    words = data_words.reshape(1, W).astype(jnp.uint32)
    # Top-down splits.
    for level in range(len(tree) - 2, -1, -1):
        la = tree[level][0::2].reshape(-1, 1)
        R = words.shape[1] // 2
        words = _split_level(words, la, R)

    leaf_words = words.reshape(n_leaf)

    def byte_mask(nbytes):
        # (1 << 8n) - 1 with the n == 4 case kept shift-safe.
        n = jnp.minimum(nbytes, 3).astype(jnp.uint32)
        partial = (jnp.uint32(1) << (8 * n)) - 1
        return jnp.where(nbytes >= 4, jnp.uint32(0xFFFFFFFF),
                         jnp.where(nbytes == 0, 0, partial))

    if pair:
        l0 = lens[0::2]
        l1 = lens[1::2]
        v0 = leaf_words & byte_mask(l0)
        v1 = (leaf_words >> (8 * l0).astype(jnp.uint32)) & byte_mask(l1)
        return jnp.stack([v0, v1], axis=1).reshape(N)
    return leaf_words & byte_mask(lens)
