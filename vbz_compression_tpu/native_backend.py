"""ctypes binding to the native C++ runtime codec (``native/libvbz_native.so``).

Replaces the reference's cffi binding layer (reference:
``python/pyvbz/vbz/build.py:29-69``) with a zero-dependency ctypes bridge to
our from-scratch native library. Exposes both:

- the raw C ABI (``vbz_compress_sized`` etc.) for strict pyvbz parity, and
- the backend interface (``svb_compress``/``svb_decompress``) so the pipeline
  API can use the native runtime as a CPU fast path.
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

from .errors import VbzError, vbz_is_error
from .options import CompressionOptions

_LIB_PATHS = [
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "native", "libvbz_native.so"),
    "libvbz_native.so",
]


class _CFseTable(ctypes.Structure):
    """vbz_fse_ctable (vbz_native.cpp): one FSE channel's encode tables."""

    _fields_ = [
        ("state_table", ctypes.c_void_p),
        ("delta_nb_bits", ctypes.c_void_p),
        ("delta_find_state", ctypes.c_void_p),
        ("accuracy_log", ctypes.c_int32),
    ]


class _COptions(ctypes.Structure):
    _fields_ = [
        ("perform_delta_zig_zag", ctypes.c_bool),
        ("integer_size", ctypes.c_uint),
        ("zstd_compression_level", ctypes.c_uint),
        ("vbz_version", ctypes.c_uint),
    ]


def _load():
    last = None
    for path in _LIB_PATHS:
        try:
            lib = ctypes.CDLL(path)
            break
        except OSError as exc:
            last = exc
            lib = None
    if lib is None:
        raise ImportError(
            f"libvbz_native.so not found (build with `make -C native`): {last}")
    u32 = ctypes.c_uint32
    vp, sz = ctypes.c_void_p, u32
    for name, args in [
        ("vbz_max_compressed_size", [sz, ctypes.POINTER(_COptions)]),
        ("vbz_compress", [vp, sz, vp, sz, ctypes.POINTER(_COptions)]),
        ("vbz_decompress", [vp, sz, vp, sz, ctypes.POINTER(_COptions)]),
        ("vbz_compress_sized", [vp, sz, vp, sz, ctypes.POINTER(_COptions)]),
        ("vbz_decompress_sized", [vp, sz, vp, sz, ctypes.POINTER(_COptions)]),
        ("vbz_decompressed_size", [vp, sz, ctypes.POINTER(_COptions)]),
    ]:
        fn = getattr(lib, name)
        fn.restype = u32
        fn.argtypes = args
    # From-scratch zstd encoder accelerators (LZ77 matcher + bitstream
    # packers, zstd_seq.py / zstd_huff.py); absent in older builds —
    # callers probe with hasattr.
    i64 = ctypes.c_int64
    ctp = ctypes.POINTER(_CFseTable)
    for name, args in [
        ("vbz_lz_match_index", [vp, i64, vp]),
        ("vbz_lz_sequences", [vp, i64, i64, i64, vp, vp]),
        ("vbz_bits_pack_backward", [vp, vp, i64, vp, i64]),
        ("vbz_zstd_seq_bitstream",
         [i64, vp, vp, vp, vp, vp, vp, vp, vp, vp, ctp, ctp, ctp, vp,
          i64]),
        # Complete from-scratch zstd frame encoder (vbz_own_zstd.cpp) —
        # byte-identical to zstd_seq.compress_frame(matcher="host").
        ("vbz_own_zstd_frame", [vp, i64, vp, i64]),
    ]:
        fn = getattr(lib, name, None)
        if fn is not None:
            fn.restype = i64
            fn.argtypes = args
    fn = getattr(lib, "vbz_huff_build_codes", None)
    if fn is not None:
        fn.restype = ctypes.c_int32
        fn.argtypes = [vp, ctypes.c_int32, vp, vp]
    return lib


_lib = None


def lib():
    global _lib
    if _lib is None:
        _lib = _load()
    return _lib


def _copts(options: CompressionOptions) -> _COptions:
    return _COptions(
        bool(options.perform_delta_zig_zag), options.integer_size,
        options.zstd_compression_level, options.vbz_version)


def _buf(data) -> tuple[ctypes.c_void_p, int]:
    arr = np.frombuffer(bytes(data), dtype=np.uint8) if not isinstance(
        data, np.ndarray) else np.ascontiguousarray(data).view(np.uint8).ravel()
    return arr, arr.size


def vbz_compress_sized(data, options: CompressionOptions) -> bytes:
    src, n = _buf(data)
    o = _copts(options)
    bound = lib().vbz_max_compressed_size(n, ctypes.byref(o))
    if vbz_is_error(bound):
        raise VbzError(bound)
    out = np.empty(bound, dtype=np.uint8)
    r = lib().vbz_compress_sized(
        src.ctypes.data_as(ctypes.c_void_p), n,
        out.ctypes.data_as(ctypes.c_void_p), bound, ctypes.byref(o))
    if vbz_is_error(r):
        raise VbzError(r)
    return out[:r].tobytes()


def vbz_decompress_sized(data, options: CompressionOptions) -> bytes:
    src, n = _buf(data)
    o = _copts(options)
    size = lib().vbz_decompressed_size(
        src.ctypes.data_as(ctypes.c_void_p), n, ctypes.byref(o))
    if vbz_is_error(size):
        raise VbzError(size)
    out = np.empty(max(size, 1), dtype=np.uint8)
    r = lib().vbz_decompress_sized(
        src.ctypes.data_as(ctypes.c_void_p), n,
        out.ctypes.data_as(ctypes.c_void_p), size, ctypes.byref(o))
    if vbz_is_error(r):
        raise VbzError(r)
    return out[:r].tobytes()


class NativeSvbBackend:
    """StreamVByte-stage backend over the native lib (zstd level forced 0)."""

    # The ctypes calls drop the GIL for the C codec's duration, so the
    # whole-pipeline threaded batch path in api.py actually parallelizes.
    gil_free_svb = True

    def svb_compress(self, data, integer_size: int, use_zigzag: bool,
                     version: int) -> bytes:
        src, n = _buf(data)
        o = _COptions(bool(use_zigzag), integer_size, 0, version)
        bound = lib().vbz_max_compressed_size(n, ctypes.byref(o))
        if vbz_is_error(bound):
            raise VbzError(bound)
        out = np.empty(bound, dtype=np.uint8)
        r = lib().vbz_compress(
            src.ctypes.data_as(ctypes.c_void_p), n,
            out.ctypes.data_as(ctypes.c_void_p), bound, ctypes.byref(o))
        if vbz_is_error(r):
            raise VbzError(r)
        return out[:r].tobytes()

    def svb_decompress(self, stream, count: int, integer_size: int,
                       use_zigzag: bool, version: int) -> np.ndarray:
        src, n = _buf(stream)
        o = _COptions(bool(use_zigzag), integer_size, 0, version)
        out = np.empty(max(count * integer_size, 1), dtype=np.uint8)
        r = lib().vbz_decompress(
            src.ctypes.data_as(ctypes.c_void_p), n,
            out.ctypes.data_as(ctypes.c_void_p), count * integer_size,
            ctypes.byref(o))
        if vbz_is_error(r):
            raise VbzError(r)
        from .ops.scalar import _SIGNED_FOR_SIZE
        return out[: count * integer_size].view(_SIGNED_FOR_SIZE[integer_size])


native_backend = NativeSvbBackend()
