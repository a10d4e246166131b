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
- Encode-side byte compaction is scatter-free: either the recursive-doubling
  packer (:mod:`.pack_doubling`) or a bisection *gather* over the monotone
  byte-offset prefix sum. XLA TPU lowers 1-D scatters pathologically;
  1-D gathers run at ~70 G elements/s on v5e.
- Decode is a gather at prefix-sum offsets plus an associative-scan prefix
  sum for delta reconstruction — the reference's 8-wide ``alignr``/``add``
  ladder (``sse3.h:524-539``) generalized to the whole chunk.
- Batched variants (``encode_batch``/``decode_batch_n``) ``lax.scan`` the
  single-row codec over rows: a TPU core runs one program at a time, so the
  scan matches fully-batched throughput at single-row compile cost. Never
  ``vmap`` these kernels — batched gathers lower ~100× slower on TPU; the
  ``*_2d`` flat-index variants exist but compile pathologically on axon.
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


def _codes_and_lengths(v: jax.Array, valid: jax.Array, max_bytes: int):
    codes = ((v > 0xFF).astype(jnp.uint32)
             + (v > 0xFFFF).astype(jnp.uint32)
             + (v > 0xFFFFFF).astype(jnp.uint32))
    codes = jnp.where(valid, codes, 0)
    lengths = jnp.where(valid, codes + 1, 0).astype(jnp.int32)
    if max_bytes < 4:
        lengths = jnp.minimum(lengths, max_bytes)
    return codes, lengths


def _pack_key_bytes(codes: jax.Array):
    N = codes.shape[0]
    kc = codes.reshape(N // 4, 4)
    return (kc[:, 0] | (kc[:, 1] << 2) | (kc[:, 2] << 4)
            | (kc[:, 3] << 6)).astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=("max_bytes", "block_values"))
def svb0_encode(values: jax.Array, n: jax.Array, max_bytes: int = 4,
                block_values: int = 256):
    """Encode uint32 ``values`` (padded length N, ``n`` valid) into a v0
    stream via the recursive-doubling packer (see
    :mod:`.pack_doubling`) — scatter-free and nearly gather-free.

    Returns ``(stream u8 [N//4 + max_bytes*N], total_len)``.
    """
    from . import pack_doubling

    N = values.shape[0]
    assert N % 4 == 0
    v = values.astype(jnp.uint32)
    valid = jnp.arange(N) < n
    v = jnp.where(valid, v, 0)
    codes, lengths = _codes_and_lengths(v, valid, max_bytes)
    key_bytes = _pack_key_bytes(codes)
    key_len = (n + 3) // 4

    bv = min(block_values, N)
    block_words, block_lens = pack_doubling.pack_blocks(
        v, lengths, max_bytes=max_bytes, block_values=bv)
    M = N // 4 + max_bytes * N
    return pack_doubling.splice_blocks(key_bytes, key_len, block_words,
                                       block_lens, M)


@functools.partial(jax.jit, static_argnames=("max_bytes",))
def svb0_encode_gf(values: jax.Array, n: jax.Array, max_bytes: int = 4):
    """Gather-free v0 encode: full-depth recursive-doubling pack + memcpy
    assembly. The only data-dependent addressing is bulk dynamic slices —
    no per-element gathers/scatters (which run at ~0.11 G/s on this TPU
    backend vs ~17 G elementwise ops/s).
    """
    from . import pack_doubling

    N = values.shape[0]
    assert N % 4 == 0
    v = values.astype(jnp.uint32)
    valid = jnp.arange(N) < n
    v = jnp.where(valid, v, 0)
    codes, lengths = _codes_and_lengths(v, valid, max_bytes)
    key_bytes = _pack_key_bytes(codes)
    key_len = (n + 3) // 4

    words, data_len = pack_doubling.pack_full(v, lengths, max_bytes=max_bytes)
    M = N // 4 + max_bytes * N
    return pack_doubling.assemble_stream(key_bytes, key_len, words, data_len,
                                         M)


@functools.partial(jax.jit, static_argnames=("out_n",))
def svb0_decode_gf(stream: jax.Array, n: jax.Array, stream_len: jax.Array,
                   out_n: int):
    """Gather-free v0 decode: key expansion by reshape, data extraction by
    one bulk dynamic slice, then recursive-halving unpack.

    Returns ``(values_u32 [out_n], ok)``.
    """
    from . import unpack_halving

    assert out_n % 4 == 0
    M = stream.shape[0]
    N = out_n
    idx = jnp.arange(N)
    valid = idx < n
    key_len = (n + 3) // 4

    # Key expansion without gathers: each key byte yields 4 codes.
    kb = stream[: N // 4].astype(jnp.uint32)
    codes = jnp.stack([kb & 3, (kb >> 2) & 3, (kb >> 4) & 3, (kb >> 6) & 3],
                      axis=1).reshape(N)
    codes = jnp.where(valid, codes, 0)
    lengths = jnp.where(valid, codes + 1, 0).astype(jnp.int32)

    total = jnp.sum(lengths)
    ok = (key_len + total == stream_len) & (key_len <= stream_len)

    # Extract the data section with one bulk dynamic slice. Pad generously:
    # dynamic_slice clamps the start when start+size exceeds the buffer,
    # which would silently shift the data section.
    W = (M + 3) // 4
    buf = jnp.concatenate([stream, jnp.zeros(N // 4 + 8, jnp.uint8)])
    data = jax.lax.dynamic_slice(buf, (key_len,), (4 * W,))
    db = data.reshape(W, 4).astype(jnp.uint32)
    words = db[:, 0] | (db[:, 1] << 8) | (db[:, 2] << 16) | (db[:, 3] << 24)
    # Cap the word buffer at what unpack needs: N words (≤ 4 bytes/value).
    words = words[:N] if W >= N else jnp.concatenate(
        [words, jnp.zeros(N - W, jnp.uint32)])

    vals = unpack_halving.unpack_full(words, lengths, max_bytes=4)
    return jnp.where(valid, vals, 0), ok


@functools.partial(jax.jit, static_argnames=("max_bytes",))
def svb0_encode_bisect(values: jax.Array, n: jax.Array, max_bytes: int = 4):
    """Encode uint32 ``values`` (padded length N, ``n`` valid) into a v0
    stream.

    Returns ``(stream, total_len)`` where ``stream`` is uint8 of static length
    ``N//4 + max_bytes*N`` and ``total_len`` is the valid byte count.
    N must be a multiple of 4.

    TPU note: the byte compaction is formulated as a pure *gather* — for each
    output byte position the source value is found by bisection over the
    monotone prefix-sum of byte lengths (log₂N rounds of vectorized gathers).
    XLA TPU lowers 1-D scatters poorly (minutes-long compiles, and the axon
    backend miscompiled them outright), while monotone gathers compile fast
    and are bit-exact — the decode path uses the same machinery.
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
    lengths = jnp.where(valid, codes + 1, 0).astype(jnp.int32)
    if max_bytes < 4:
        # Width-limited configs (e.g. int16 zig-zag wraps in 16 bits) can
        # never emit more than max_bytes — help the compiler.
        lengths = jnp.minimum(lengths, max_bytes)

    # --- key section: 4 codes per byte, little-endian 2-bit fields.
    kc = codes.reshape(N // 4, 4)
    key_bytes = (kc[:, 0] | (kc[:, 1] << 2) | (kc[:, 2] << 4)
                 | (kc[:, 3] << 6)).astype(jnp.uint8)
    key_len = (n + 3) // 4

    # --- data section via inverse-map gather.
    # F[i] = exclusive prefix sum of lengths = data-relative offset of value i.
    F = _exclusive_cumsum(lengths)
    data_len = F[-1] + lengths[-1]
    total_len = key_len + data_len

    M = N // 4 + max_bytes * N
    p = jnp.arange(M, dtype=jnp.int32)
    j = jnp.maximum(p - key_len, 0)  # data-relative output position

    # Bisection: i(j) = max { i : F[i] <= j }, F monotone nondecreasing.
    lo = jnp.zeros(M, dtype=jnp.int32)
    hi = jnp.minimum(j, N - 1)
    for _ in range(N.bit_length()):
        mid = (lo + hi + 1) >> 1
        pred = F[jnp.clip(mid, 0, N - 1)] <= j
        lo = jnp.where(pred, mid, lo)
        hi = jnp.where(pred, hi, mid - 1)
    i = jnp.clip(lo, 0, N - 1)
    sub = (j - F[i]).astype(jnp.uint32)
    data_byte = ((v[i] >> (8 * jnp.minimum(sub, 3))) & 0xFF).astype(jnp.uint8)

    key_byte = key_bytes[jnp.minimum(p, N // 4 - 1)]
    out = jnp.where(p < key_len, key_byte, data_byte)
    out = jnp.where(p < total_len, out, 0)
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
# Batched v0 codec — flat-index gathers instead of vmap
#
# vmap would turn every gather into a *batched gather*, which XLA TPU lowers
# pathologically (two orders of magnitude slower, minutes-long compiles on
# the axon backend). Expressing the batch dimension with explicit flat
# indices keeps every gather 1-D and fast (measured ~70 G gathers/s).
# ---------------------------------------------------------------------------


def zigzag_delta_fwd_batch(x: jax.Array, integer_size: int) -> jax.Array:
    """[B, N] signed input → [B, N] uint32 zig-zag delta values."""
    if integer_size == 2:
        x16 = x.astype(jnp.int16)
        prev = jnp.roll(x16, 1, axis=1).at[:, 0].set(0)
        delta = (x16 - prev).astype(jnp.int16)
        zz = (delta.astype(jnp.uint16) << 1) ^ (delta >> 15).astype(jnp.uint16)
        return zz.astype(jnp.uint32)
    x32 = x.astype(jnp.int32)
    prev = jnp.roll(x32, 1, axis=1).at[:, 0].set(0)
    delta = x32 - prev
    return (delta.astype(jnp.uint32) << 1) ^ (delta >> 31).astype(jnp.uint32)


def zigzag_delta_inv_batch(values: jax.Array, integer_size: int) -> jax.Array:
    if integer_size == 2:
        v16 = values.astype(jnp.uint16)
        delta = ((v16 >> 1) ^ (-(v16 & 1).astype(jnp.int16)).astype(jnp.uint16))
        out = jnp.cumsum(delta.astype(jnp.uint16), axis=1, dtype=jnp.uint16)
        return out.astype(jnp.int16)
    v = values.astype(jnp.uint32)
    delta = (v >> 1) ^ (-(v & 1).astype(jnp.int32)).astype(jnp.uint32)
    out = jnp.cumsum(delta, axis=1, dtype=jnp.uint32).astype(jnp.int32)
    if integer_size == 1:
        return out.astype(jnp.int8)
    return out


@functools.partial(jax.jit,
                   static_argnames=("integer_size", "use_zigzag"))
def encode_batch(x: jax.Array, n: jax.Array, integer_size: int,
                 use_zigzag: bool):
    """Batched v0 encode: x [B, N] (N multiple of 4), n [B] valid counts.

    Returns ``(streams [B, M] u8, totals [B])``.

    Implementation: ``lax.scan`` of the single-row encoder over rows. A TPU
    chip core runs one program at a time, so a sequential scan of efficient
    rows matches fully-batched throughput — while compiling in single-row
    time (the fully 2-D formulation took >25 min to compile on the axon
    backend; scan compiles in seconds).
    """
    def step(_, xn):
        xi, ni = xn
        stream, total = encode_chunk(xi, ni, integer_size, use_zigzag)
        return None, (stream, total)

    _, (streams, totals) = jax.lax.scan(step, None, (x, n))
    return streams, totals


@functools.partial(jax.jit,
                   static_argnames=("integer_size", "use_zigzag"))
def encode_batch_2d(x: jax.Array, n: jax.Array, integer_size: int,
                    use_zigzag: bool):
    """Fully 2-D batched v0 encode (flat-index gathers). Functionally
    identical to :func:`encode_batch`; kept for backends where scan overhead
    dominates (CPU testing) — avoid on axon (compile blow-up)."""
    B, N = x.shape
    assert N % 4 == 0
    if use_zigzag:
        v = zigzag_delta_fwd_batch(x, integer_size)
    else:
        v = x.astype(jnp.int32).view(jnp.uint32)
    max_bytes = max_bytes_per_value(integer_size, use_zigzag)

    idx = jnp.arange(N)[None, :]
    valid = idx < n[:, None]
    v = jnp.where(valid, v, 0)

    codes = ((v > 0xFF).astype(jnp.uint32)
             + (v > 0xFFFF).astype(jnp.uint32)
             + (v > 0xFFFFFF).astype(jnp.uint32))
    codes = jnp.where(valid, codes, 0)
    lengths = jnp.where(valid, codes + 1, 0).astype(jnp.int32)
    if max_bytes < 4:
        lengths = jnp.minimum(lengths, max_bytes)

    kc = codes.reshape(B, N // 4, 4)
    key_bytes = (kc[:, :, 0] | (kc[:, :, 1] << 2) | (kc[:, :, 2] << 4)
                 | (kc[:, :, 3] << 6)).astype(jnp.uint8)
    key_len = (n + 3) // 4                              # [B]

    F = jnp.cumsum(lengths, axis=1) - lengths           # [B, N] excl. cumsum
    data_len = F[:, -1] + lengths[:, -1]
    total_len = key_len + data_len                      # [B]

    M = N // 4 + max_bytes * N
    p = jnp.arange(M, dtype=jnp.int32)[None, :]         # [1, M]
    j = jnp.maximum(p - key_len[:, None], 0)            # [B, M]

    F_flat = F.reshape(-1)
    row_base = (jnp.arange(B, dtype=jnp.int32) * N)[:, None]
    lo = jnp.zeros((B, M), dtype=jnp.int32)
    hi = jnp.minimum(j, N - 1)
    for _ in range(N.bit_length()):
        mid = (lo + hi + 1) >> 1
        pred = F_flat[row_base + jnp.clip(mid, 0, N - 1)] <= j
        lo = jnp.where(pred, mid, lo)
        hi = jnp.where(pred, hi, mid - 1)
    i = jnp.clip(lo, 0, N - 1)
    sub = (j - F_flat[row_base + i]).astype(jnp.uint32)
    v_flat = v.reshape(-1)
    data_byte = ((v_flat[row_base + i] >> (8 * jnp.minimum(sub, 3))) & 0xFF
                 ).astype(jnp.uint8)

    kb_flat = key_bytes.reshape(-1)
    krow_base = (jnp.arange(B, dtype=jnp.int32) * (N // 4))[:, None]
    key_byte = kb_flat[krow_base + jnp.minimum(p, N // 4 - 1)]
    out = jnp.where(p < key_len[:, None], key_byte, data_byte)
    out = jnp.where(p < total_len[:, None], out, 0)
    return out, total_len




@functools.partial(jax.jit,
                   static_argnames=("integer_size", "use_zigzag", "out_n"))
def decode_batch_n(streams: jax.Array, n: jax.Array, stream_len: jax.Array,
                   integer_size: int, use_zigzag: bool, out_n: int):
    """Batched v0 decode via lax.scan of the single-row decoder (see
    :func:`encode_batch` for why scan beats 2-D batching here).

    Returns ``(x [B, out_n] signed, ok [B])``.
    """
    def step(_, snl):
        si, ni, li = snl
        out, ok = decode_chunk(si, ni, li, integer_size, use_zigzag, out_n)
        return None, (out, ok)

    _, (outs, oks) = jax.lax.scan(step, None, (streams, n, stream_len))
    return outs, oks


@functools.partial(jax.jit,
                   static_argnames=("integer_size", "use_zigzag", "out_n"))
def decode_batch_2d(streams: jax.Array, n: jax.Array, stream_len: jax.Array,
                    integer_size: int, use_zigzag: bool, out_n: int):
    """Fully 2-D batched v0 decode (flat-index gathers)."""
    B, M = streams.shape
    N = out_n
    assert N % 4 == 0
    idx = jnp.arange(N, dtype=jnp.int32)[None, :]
    valid = idx < n[:, None]
    key_len = (n + 3) // 4                               # [B]

    s_flat = streams.reshape(-1)
    row_base = (jnp.arange(B, dtype=jnp.int32) * M)[:, None]

    key_idx = jnp.minimum(idx >> 2, M - 1)
    keys = s_flat[row_base + key_idx].astype(jnp.uint32)
    codes = (keys >> ((idx & 3).astype(jnp.uint32) * 2)) & 3
    codes = jnp.where(valid, codes, 0)
    lengths = jnp.where(valid, codes + 1, 0).astype(jnp.int32)

    offsets = (jnp.cumsum(lengths, axis=1) - lengths) + key_len[:, None]
    data_end = offsets[:, -1] + lengths[:, -1]
    ok = (data_end == stream_len) & (key_len <= stream_len)

    gcols = jnp.arange(4, dtype=jnp.int32)
    gidx = jnp.clip(offsets[:, :, None] + gcols[None, None, :], 0, M - 1)
    gathered = s_flat[row_base[:, :, None] + gidx].astype(jnp.uint32)
    col_mask = gcols[None, None, :] < lengths[:, :, None]
    shifts = (gcols * 8).astype(jnp.uint32)[None, None, :]
    vals = jnp.sum(jnp.where(col_mask, gathered << shifts, 0), axis=2,
                   dtype=jnp.uint32)
    vals = jnp.where(valid, vals, 0)

    if use_zigzag:
        out = zigzag_delta_inv_batch(vals, integer_size)
    else:
        out = narrow_inv(vals.reshape(-1), integer_size).reshape(B, N)
    return out, ok


# ---------------------------------------------------------------------------
# v1: half-byte wire format (integer_size == 1 only)
# ---------------------------------------------------------------------------


@jax.jit
def svb1_encode(values: jax.Array, n: jax.Array):
    """Encode uint32 ``values`` into a v1 half-byte stream (semantics of
    ``scalar.svb1_encode``; reference ``v1/impl.h:112-125``).

    Returns ``(stream u8 [N//4 + 2N], total_len)``. Same gather-bisection
    design as :func:`svb0_encode`, but in nibble units.
    """
    N = values.shape[0]
    assert N % 4 == 0
    v = values.astype(jnp.uint32)
    idx = jnp.arange(N)
    valid = idx < n
    v = jnp.where(valid, v, 0)

    codes = jnp.where(
        v == 0, 0, jnp.where(v < 16, 1, jnp.where(v < 256, 2, 3))
    ).astype(jnp.int32)
    codes = jnp.where(valid, codes, 0)
    # nibbles per code: 0,1,2,4  ==  (1<<code)>>1
    ncounts = jnp.where(valid, (1 << codes) >> 1, 0).astype(jnp.int32)

    kc = codes.reshape(N // 4, 4)
    key_bytes = (kc[:, 0] | (kc[:, 1] << 2) | (kc[:, 2] << 4)
                 | (kc[:, 3] << 6)).astype(jnp.uint8)
    key_len = (n + 3) // 4

    G = _exclusive_cumsum(ncounts)  # nibble offsets
    total_nibbles = G[-1] + ncounts[-1]
    data_len = (total_nibbles + 1) >> 1
    total_len = key_len + data_len

    M = N // 4 + 2 * N
    p = jnp.arange(M, dtype=jnp.int32)
    b = jnp.maximum(p - key_len, 0)  # data-relative byte position

    def nib_at(q):
        lo = jnp.zeros(M, dtype=jnp.int32)
        # Upper bound is N-1 (not q): zero-nibble values mean the owning
        # value index can exceed the nibble position.
        hi = jnp.full(M, N - 1, dtype=jnp.int32)
        for _ in range(N.bit_length()):
            mid = (lo + hi + 1) >> 1
            pred = G[jnp.clip(mid, 0, N - 1)] <= q
            lo = jnp.where(pred, mid, lo)
            hi = jnp.where(pred, hi, mid - 1)
        i = jnp.clip(lo, 0, N - 1)
        sub = (q - G[i]).astype(jnp.uint32)
        nib = (v[i] >> (4 * jnp.minimum(sub, 3))) & 0xF
        return jnp.where(q < total_nibbles, nib, 0)

    byte = (nib_at(2 * b) | (nib_at(2 * b + 1) << 4)).astype(jnp.uint8)
    key_byte = key_bytes[jnp.minimum(p, N // 4 - 1)]
    out = jnp.where(p < key_len, key_byte, byte)
    out = jnp.where(p < total_len, out, 0)
    return out, total_len


@functools.partial(jax.jit, static_argnames=("out_n",))
def svb1_decode_n(stream: jax.Array, n: jax.Array, stream_len: jax.Array,
                  out_n: int):
    """Decode ``n`` values from a v1 half-byte stream. Returns
    ``(values_u32, ok)``; validation mirrors
    ``streamvbyte_validate_stream_half`` (``v1/impl.h:183-216``)."""
    assert out_n % 4 == 0
    M = stream.shape[0]
    idx = jnp.arange(out_n)
    valid = idx < n
    key_len = (n + 3) // 4

    key_idx = jnp.minimum(idx >> 2, M - 1)
    keys = stream[key_idx].astype(jnp.uint32)
    codes = (keys >> ((idx & 3).astype(jnp.uint32) * 2)) & 3
    codes = jnp.where(valid, codes, 0).astype(jnp.int32)
    ncounts = jnp.where(valid, (1 << codes) >> 1, 0).astype(jnp.int32)

    G = _exclusive_cumsum(ncounts)
    total_nibbles = G[-1] + ncounts[-1]
    data_len = (total_nibbles + 1) >> 1
    ok = (key_len + data_len == stream_len) & (key_len <= stream_len)

    # Gather up to 4 nibbles per value from the nibble stream.
    gcols = jnp.arange(4, dtype=jnp.int32)
    q = G[:, None] + gcols[None, :]               # nibble positions
    byte_idx = jnp.clip(key_len + (q >> 1), 0, M - 1)
    raw = stream[byte_idx].astype(jnp.uint32)
    nibs = (raw >> (4 * (q & 1)).astype(jnp.uint32)) & 0xF
    col_mask = gcols[None, :] < ncounts[:, None]
    shifts = (gcols * 4).astype(jnp.uint32)[None, :]
    vals = jnp.sum(jnp.where(col_mask, nibs << shifts, 0), axis=1,
                   dtype=jnp.uint32)
    return jnp.where(valid, vals, 0), ok


# ---------------------------------------------------------------------------
# Full single-chunk pipelines (transform + pack), jit entry points
# ---------------------------------------------------------------------------


@functools.partial(jax.jit,
                   static_argnames=("integer_size", "use_zigzag", "version"))
def encode_chunk(x: jax.Array, n: jax.Array, integer_size: int,
                 use_zigzag: bool, version: int = 0):
    """x: padded 1-D signed array (length multiple of 4) of the codec width;
    returns (stream u8, total_len). ``version`` selects the wire format
    (v1 only changes behaviour for ``integer_size == 1``, mirroring
    ``vbz/v1/vbz_streamvbyte.cpp:37-64``)."""
    if use_zigzag:
        values = zigzag_delta_fwd(x, integer_size)
        # Padding must not disturb deltas at the valid boundary: entries ≥ n
        # are zeroed inside svb0_encode via the valid mask.
    else:
        values = widen_fwd(x)
    if version == 1 and integer_size == 1:
        return svb1_encode(values, n)
    mb = max_bytes_per_value(integer_size, use_zigzag)
    # Gather-free encode: per-element gathers run at ~0.11 G/s on this TPU
    # backend; the doubling pack + memcpy assembly avoids them entirely.
    return svb0_encode_gf(values, n, max_bytes=mb)


@functools.partial(jax.jit,
                   static_argnames=("integer_size", "use_zigzag", "out_n",
                                    "version"))
def decode_chunk(stream: jax.Array, n: jax.Array, stream_len: jax.Array,
                 integer_size: int, use_zigzag: bool, out_n: int,
                 version: int = 0):
    """Returns (x, ok): padded signed output of the codec width."""
    if version == 1 and integer_size == 1:
        values, ok = svb1_decode_n(stream, n, stream_len, out_n)
    else:
        values, ok = svb0_decode_gf(stream, n, stream_len, out_n)
    if use_zigzag:
        out = zigzag_delta_inv(values, integer_size)
    else:
        out = narrow_inv(values, integer_size)
    return out, ok
