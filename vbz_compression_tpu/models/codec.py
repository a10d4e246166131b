"""JAX codec backend — the host-facing wrapper around the TPU data plane.

Presents the same backend interface as the NumPy oracle
(``svb_compress`` / ``svb_decompress``) so the pipeline orchestrator
(:mod:`..api`) can run the StreamVByte stage on TPU, plus a batched API for
bulk chunk workloads.

Static-shape management: chunk lengths are padded to bucket sizes so the jit
cache stays small (SURVEY.md §7 "ragged reads" landmine). Buckets double from
4 KiB values up; one compiled executable serves each
(bucket, integer_size, zigzag) combination.

"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..errors import (
    VBZ_INTEGER_SIZE_ERROR,
    VBZ_STREAMVBYTE_STREAM_ERROR,
    VbzError,
)
from ..ops import jax_svb, scalar

_SIGNED_FOR_SIZE = {1: np.int8, 2: np.int16, 4: np.int32}
_MIN_BUCKET = 4096


def bucket_size(count: int) -> int:
    b = _MIN_BUCKET
    while b < count:
        b *= 2
    return b


def _pad_to(arr: np.ndarray, size: int) -> np.ndarray:
    out = np.zeros(size, dtype=arr.dtype)
    out[: arr.size] = arr
    return out


class JaxSvbBackend:
    """StreamVByte stage on the JAX/XLA data plane (drop-in for the oracle)."""

    def __init__(self, device=None):
        self.device = device

    # -- backend interface ---------------------------------------------------

    def svb_compress(self, data, integer_size: int, use_zigzag: bool,
                     version: int) -> bytes:
        if integer_size not in (1, 2, 4):
            raise VbzError(VBZ_INTEGER_SIZE_ERROR, f"integer_size={integer_size}")
        raw = np.frombuffer(bytes(data), dtype=np.uint8) if not isinstance(
            data, np.ndarray) else np.ascontiguousarray(data).view(np.uint8).ravel()
        if raw.size % integer_size != 0:
            from ..errors import VBZ_INPUT_SIZE_ERROR
            raise VbzError(VBZ_INPUT_SIZE_ERROR,
                           f"{raw.size} % {integer_size} != 0")
        typed = raw.view(_SIGNED_FOR_SIZE[integer_size])
        n = typed.size
        if n == 0:
            return b""
        N = bucket_size(n)
        x = _pad_to(typed, N)
        stream, total = jax_svb.encode_chunk(
            jnp.asarray(x), jnp.int32(n), integer_size, use_zigzag,
            version=version)
        total = int(total)
        return np.asarray(stream[:total]).tobytes()

    def svb_decompress(self, stream, count: int, integer_size: int,
                       use_zigzag: bool, version: int) -> np.ndarray:
        if integer_size not in (1, 2, 4):
            raise VbzError(VBZ_INTEGER_SIZE_ERROR, f"integer_size={integer_size}")
        buf = np.frombuffer(bytes(stream), dtype=np.uint8) if not isinstance(
            stream, np.ndarray) else stream.astype(np.uint8, copy=False)
        in_len = buf.size
        if count == 0 or in_len == 0:
            if in_len != count:
                raise VbzError(VBZ_STREAMVBYTE_STREAM_ERROR,
                               "empty stream mismatch")
            return np.zeros(0, dtype=_SIGNED_FOR_SIZE[integer_size])
        N = bucket_size(count)
        M = N // 4 + (2 * N if (version == 1 and integer_size == 1) else 4 * N)
        padded = _pad_to(buf, max(M, in_len))[:M] if in_len <= M else None
        if padded is None:
            raise VbzError(VBZ_STREAMVBYTE_STREAM_ERROR, "stream too long")
        out, ok = jax_svb.decode_chunk(
            jnp.asarray(padded), jnp.int32(count), jnp.int32(in_len),
            integer_size, use_zigzag, N, version=version)
        if not bool(ok):
            raise VbzError(VBZ_STREAMVBYTE_STREAM_ERROR, "validation failed")
        return np.asarray(out[:count])


jax_backend = JaxSvbBackend()
