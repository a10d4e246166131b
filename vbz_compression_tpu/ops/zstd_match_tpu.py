"""TPU-resident LZ77 match finding for the from-scratch zstd encoder.

The reference drives libzstd's hash-table match finder on the CPU
(``vbz/vbz.cpp:194-207``); hash tables need scatters, which this TPU
backend cannot do (ROADMAP.md: gathers/scatters forbidden). Instead the
match finder is recast as **compare-at-bounded-offsets**: for a fixed
offset set O, ``match4_o[i] = buf[i..i+4) == buf[i-o..i-o+4)`` is pure
shift + compare + AND — embarrassingly VPU-friendly, no tables. The host
greedy assembler (:func:`.zstd_seq.find_sequences`) extends every accepted
candidate to its true length from the buffer, so the device only has to
certify "a >=4-byte match exists at offset o", never measure lengths.

Smaller offsets are preferred (they cost fewer offset-code bits and are
what zstd's own fast strategy favors). The bounded set trades a little
ratio on far-match-heavy data for a table-free data plane; on StreamVByte
payloads of delta-coded signal, matches are overwhelmingly short-range.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

MIN_MATCH = 4

# Offsets probed, in preference order (nearest first). Dense short range
# plus a geometric tail; svb payloads of periodic signal match mostly short.
DEFAULT_OFFSETS = (1, 2, 3, 4, 5, 6, 7, 8, 10, 12, 16, 20, 24, 32, 48, 64,
                   96, 128, 192, 256, 384, 512, 768, 1024)


@functools.partial(jax.jit, static_argnames=("offsets",))
def match_candidates(buf: jax.Array, offsets: tuple = DEFAULT_OFFSETS):
    """Per-position nearest offset with a >=4-byte backward match.

    buf: [N] uint8/int32. Returns ``off`` i32 [N]: the smallest offset in
    ``offsets`` such that ``buf[i:i+4] == buf[i-off:i-off+4]`` (0 when
    none; positions with i < off or i+4 > N never match).
    """
    b = buf.astype(jnp.int32)
    N = b.shape[0]
    idx = jnp.arange(N, dtype=jnp.int32)
    best = jnp.zeros(N, dtype=jnp.int32)
    for o in offsets:
        if o + MIN_MATCH > N:
            break
        # eq[i] = b[i] == b[i-o] (False for i < o)
        eq = jnp.concatenate(
            [jnp.zeros(o, jnp.bool_), b[o:] == b[:-o]])
        # 4-byte run starting at i: eq[i] & eq[i+1] & eq[i+2] & eq[i+3]
        e2 = eq & jnp.concatenate([eq[1:], jnp.zeros(1, jnp.bool_)])
        m4 = e2 & jnp.concatenate([e2[2:], jnp.zeros(2, jnp.bool_)])
        m4 = m4 & (idx + MIN_MATCH <= N)
        best = jnp.where((best == 0) & m4, o, best)
    return best


def build_match_index_tpu(buf: np.ndarray,
                          offsets: tuple = DEFAULT_OFFSETS):
    """Drop-in for :func:`.zstd_seq.build_match_index`, with the candidate
    scan on the accelerator: returns ``(prev, v4)`` where ``prev[i]`` is the
    nearest bounded-offset source (-1 when none) and ``v4`` the 4-byte
    windows the host greedy uses for verification."""
    n = buf.size
    if n < MIN_MATCH:
        return np.zeros(0, np.int64), np.zeros(0, np.uint32)
    off = np.asarray(match_candidates(jnp.asarray(buf), offsets=offsets))
    off = off[: n - 3].astype(np.int64)
    pos = np.arange(n - 3, dtype=np.int64)
    prev = np.where(off > 0, pos - off, -1)
    b = buf.astype(np.uint32)
    v4 = b[:-3] | (b[1:-2] << 8) | (b[2:-1] << 16) | (b[3:] << 24)
    return prev, v4
