"""JAX/XLA StreamVByte codec — the TPU data plane.

A from-scratch, jit-able re-design of the VBZ transform + variable-byte stage
for XLA's compilation model: every function here works on **static padded
shapes** with runtime valid-counts, uses no data-dependent Python control
flow, and keeps all math in wide lanes the VPU can chew on.

Wire-format semantics are identical to the NumPy oracle
(:mod:`.scalar`) and therefore to the reference codec: v0 classic
StreamVByte (reference ``vbz/v0/``) with width-exact delta/zig-zag
(16-bit wraparound for int16 — the SSE kernel semantics of
``vbz/v0/vbz_streamvbyte_impl_sse3.h:431-440``).

Layout of an encoded stream (reference ``sse3.h:415-417``):
``[(count+3)//4 key bytes][variable data bytes]``.

Design notes (TPU-first):
- Encode-side byte compaction is a masked stream-compaction: staged bytes get
  target positions from an exclusive prefix-sum and are placed with a sorted
  unique scatter. The decode side is a gather at prefix-sum offsets plus an
  associative-scan prefix sum for the delta reconstruction — the reference's
  8-wide ``alignr``/``add`` ladder (``sse3.h:524-539``) generalized to the
  whole chunk.
- All staging stays in 32-bit lanes (TPU native); u8 views only materialize
  at the HBM boundary.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

# Max data bytes per value, by (integer_size, zigzag). int16+zigzag wraps in
# 16 bits so 2 bytes suffice; int8+zigzag deltas are ≤ 510 (2 bytes); all
# remaining configs can sign-extend to 32 bits (4 bytes).
def max_bytes_per_value(integer_size: int, use_zigzag: bool) -> int:
    if use_zigzag and integer_size in (1, 2):
        return 2
    if not use_zigzag and integer_size == 1:
        # uint8 widened values are < 256 only when non-negative; int8 sign
        # extension can produce 0xFFFFFFxx → 4 bytes.
        return 4
    return 4


# ---------------------------------------------------------------------------
# Transforms (width-exact delta + zig-zag)
# ---------------------------------------------------------------------------


def zigzag_delta_fwd(x: jax.Array, integer_size: int) -> jax.Array:
    """Signed input → uint32 zig-zag delta values (semantics of
    ``scalar.zigzag_delta_encode``)."""
    if integer_size == 2:
        x16 = x.astype(jnp.int16)
        prev = jnp.roll(x16, 1).at[0].set(0)
        delta = (x16 - prev).astype(jnp.int16)
        zz = (delta.astype(jnp.uint16) << 1) ^ (delta >> 15).astype(jnp.uint16)
        return zz.astype(jnp.uint32)
    x32 = x.astype(jnp.int32)
    prev = jnp.roll(x32, 1).at[0].set(0)
    delta = x32 - prev
    return (delta.astype(jnp.uint32) << 1) ^ (delta >> 31).astype(jnp.uint32)


def zigzag_delta_inv(values: jax.Array, integer_size: int) -> jax.Array:
    """uint32 zig-zag delta values → signed output (semantics of
    ``scalar.zigzag_delta_decode``; cumsum = associative scan on TPU)."""
    if integer_size == 2:
        v16 = values.astype(jnp.uint16)
        delta = ((v16 >> 1) ^ (-(v16 & 1).astype(jnp.int16)).astype(jnp.uint16))
        out = jnp.cumsum(delta.astype(jnp.uint16), dtype=jnp.uint16)
        return out.astype(jnp.int16)
    v = values.astype(jnp.uint32)
    delta = (v >> 1) ^ (-(v & 1).astype(jnp.int32)).astype(jnp.uint32)
    out = jnp.cumsum(delta, dtype=jnp.uint32).astype(jnp.int32)
    if integer_size == 1:
        return out.astype(jnp.int8)
    return out


def widen_fwd(x: jax.Array) -> jax.Array:
    """No-zig-zag path: sign-extend to 32-bit, reinterpret unsigned."""
    return x.astype(jnp.int32).view(jnp.uint32)


def narrow_inv(values: jax.Array, integer_size: int) -> jax.Array:
    if integer_size == 1:
        return values.astype(jnp.uint8).view(jnp.int8)
    if integer_size == 2:
        return values.astype(jnp.uint16).view(jnp.int16)
    return values.view(jnp.int32)


# ---------------------------------------------------------------------------
# v0 encode
# ---------------------------------------------------------------------------


def _exclusive_cumsum(x: jax.Array) -> jax.Array:
    c = jnp.cumsum(x)
    return c - x


@functools.partial(jax.jit, static_argnames=("max_bytes",))
def svb0_encode(values: jax.Array, n: jax.Array, max_bytes: int = 4):
    """Encode uint32 ``values`` (padded length N, ``n`` valid) into a v0
    stream.

    Returns ``(stream, total_len)`` where ``stream`` is uint8 of static length
    ``N//4 + max_bytes*N`` and ``total_len`` is the valid byte count.
    N must be a multiple of 4.
    """
    N = values.shape[0]
    assert N % 4 == 0, "padded length must be a multiple of 4"
    v = values.astype(jnp.uint32)
    idx = jnp.arange(N)
    valid = idx < n
    v = jnp.where(valid, v, 0)

    codes = ((v > 0xFF).astype(jnp.uint32)
             + (v > 0xFFFF).astype(jnp.uint32)
             + (v > 0xFFFFFF).astype(jnp.uint32))
    codes = jnp.where(valid, codes, 0)
    lengths = jnp.where(valid, codes + 1, 0)

    # --- key section: 4 codes per byte, little-endian 2-bit fields.
    kc = codes.reshape(N // 4, 4)
    key_bytes = (kc[:, 0] | (kc[:, 1] << 2) | (kc[:, 2] << 4)
                 | (kc[:, 3] << 6)).astype(jnp.uint8)
    key_len = (n + 3) // 4

    # --- data section: stage max_bytes LE bytes per value, compact.
    stage_cols = jnp.arange(max_bytes, dtype=jnp.uint32)
    staged = ((v[:, None] >> (stage_cols[None, :] * 8)) & 0xFF).astype(jnp.uint32)
    stage_valid = (stage_cols[None, :] < lengths[:, None]).reshape(-1)
    staged = staged.reshape(-1)
    pos = _exclusive_cumsum(stage_valid.astype(jnp.int32))
    data_len = pos[-1] + stage_valid[-1].astype(jnp.int32)
    M = N // 4 + max_bytes * N
    # Sorted unique scatter; dropped slots (invalid bytes) go out of range.
    target = jnp.where(stage_valid, pos, M)
    data = jnp.zeros(M, dtype=jnp.uint8).at[target].set(
        staged.astype(jnp.uint8), mode="drop", unique_indices=True,
        indices_are_sorted=True)

    # --- assemble: keys at [0, key_len), data shifted to key_len.
    out = jnp.zeros(M, dtype=jnp.uint8)
    out = jax.lax.dynamic_update_slice(out, key_bytes, (0,))
    # Writing the full data block at offset key_len overwrites any key-section
    # overhang; dynamic_update_slice clamps the start so M ≥ key_len + M would
    # clip — instead place data with a shifted scatter-free roll:
    out = jax.lax.select(
        jnp.arange(M) < key_len, out,
        jnp.roll(data, key_len))
    total_len = key_len + data_len
    return out, total_len


# ---------------------------------------------------------------------------
# v0 decode
# ---------------------------------------------------------------------------




@functools.partial(jax.jit, static_argnames=("out_n",))
def svb0_decode_n(stream: jax.Array, n: jax.Array, stream_len: jax.Array,
                  out_n: int):
    """Decode ``n`` values (≤ static ``out_n``, multiple of 4) from ``stream``
    (uint8, any static padded length). Returns ``(values_u32, ok)``.

    Validation mirrors ``streamvbyte_validate_stream`` + the consumed-bytes
    check (``v0/impl.h:49-67``): ok is False when the data section length
    disagrees with the key codes.
    """
    assert out_n % 4 == 0
    M = stream.shape[0]
    idx = jnp.arange(out_n)
    valid = idx < n
    key_len = (n + 3) // 4

    # Key gather: value i reads key byte i//4 (within [0, key_len)).
    key_idx = jnp.minimum(idx >> 2, M - 1)
    keys = stream[key_idx].astype(jnp.uint32)
    codes = (keys >> ((idx & 3).astype(jnp.uint32) * 2)) & 3
    codes = jnp.where(valid, codes, 0)
    lengths = jnp.where(valid, codes + 1, 0)

    offsets = _exclusive_cumsum(lengths.astype(jnp.int32)) + key_len
    data_end = offsets[-1] + lengths[-1].astype(jnp.int32)
    ok = (data_end == stream_len) & (key_len <= stream_len)

    # Byte gather: 4 candidate bytes per value, masked by code length.
    gcols = jnp.arange(4, dtype=jnp.int32)
    gidx = jnp.clip(offsets[:, None] + gcols[None, :], 0, M - 1)
    gathered = stream[gidx].astype(jnp.uint32)
    col_mask = gcols[None, :] < lengths[:, None]
    shifts = (gcols * 8).astype(jnp.uint32)[None, :]
    vals = jnp.sum(jnp.where(col_mask, gathered << shifts, 0), axis=1,
                   dtype=jnp.uint32)
    return jnp.where(valid, vals, 0), ok


# ---------------------------------------------------------------------------
# Full single-chunk pipelines (transform + pack), jit entry points
# ---------------------------------------------------------------------------


@functools.partial(jax.jit,
                   static_argnames=("integer_size", "use_zigzag"))
def encode_chunk(x: jax.Array, n: jax.Array, integer_size: int,
                 use_zigzag: bool):
    """x: padded 1-D signed array (length multiple of 4) of the codec width;
    returns (stream u8, total_len)."""
    if use_zigzag:
        values = zigzag_delta_fwd(x, integer_size)
        # Padding must not disturb deltas at the valid boundary: entries ≥ n
        # are zeroed inside svb0_encode via the valid mask.
    else:
        values = widen_fwd(x)
    mb = max_bytes_per_value(integer_size, use_zigzag)
    return svb0_encode(values, n, max_bytes=mb)


@functools.partial(jax.jit,
                   static_argnames=("integer_size", "use_zigzag", "out_n"))
def decode_chunk(stream: jax.Array, n: jax.Array, stream_len: jax.Array,
                 integer_size: int, use_zigzag: bool, out_n: int):
    """Returns (x, ok): padded signed output of the codec width."""
    values, ok = svb0_decode_n(stream, n, stream_len, out_n)
    if use_zigzag:
        out = zigzag_delta_inv(values, integer_size)
    else:
        out = narrow_inv(values, integer_size)
    return out, ok
