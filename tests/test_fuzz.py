"""Fuzz-style robustness tests — the framework's counterpart of the
reference's libFuzzer harness + corpus replay (reference:
``vbz/fuzzing/vbz_fuzz.cpp:63-191``).

Two properties, swept over the full 32-config option lattice:
1. compress → decompress → byte-compare (sized and unsized), arbitrary input;
2. decompress of *arbitrary bytes* with plausible output sizes must either
   raise a VbzError or return data — never crash, hang, or read OOB.
"""

import os

import numpy as np
import pytest

from vbz_compression_tpu import CompressionOptions, VbzError, api
from vbz_compression_tpu.ops import scalar

CONFIGS = [
    CompressionOptions(zz, sz, lvl, ver)
    for zz in (False, True)
    for sz in (0, 1, 2, 4)
    for lvl in (0, 1)
    for ver in (0, 1)
]


def _inputs(seed):
    rng = np.random.default_rng(seed)
    kinds = [
        rng.integers(0, 256, rng.integers(0, 300) * 4, dtype=np.uint8),
        rng.integers(0, 2, rng.integers(0, 100) * 4, dtype=np.uint8) * 255,
        np.zeros(rng.integers(0, 64) * 4, dtype=np.uint8),
        rng.integers(0, 256, 4 * rng.integers(0, 5000), dtype=np.uint8),
    ]
    return [k.tobytes() for k in kinds]


@pytest.mark.slow
@pytest.mark.parametrize("seed", range(6))
def test_fuzz_roundtrip_all_configs(seed):
    for data in _inputs(seed):
        for opts in CONFIGS:
            sized = api.vbz_compress_sized(data, opts)
            assert api.vbz_decompress_sized(sized, opts) == data
            unsized = api.vbz_compress(data, opts)
            assert api.vbz_decompress(unsized, len(data), opts) == data


@pytest.mark.slow
@pytest.mark.parametrize("seed", range(8))
def test_fuzz_adversarial_decompress(seed):
    rng = np.random.default_rng(1000 + seed)
    blob = rng.integers(0, 256, rng.integers(1, 2000), dtype=np.uint8).tobytes()
    for opts in CONFIGS:
        # Sized path: never crash.
        try:
            out = api.vbz_decompress_sized(blob, opts)
            assert isinstance(out, bytes)
        except VbzError:
            pass
        # Unsized with doubling probe sizes (mirrors vbz_fuzz.cpp:138-161).
        size = 4
        while size <= 1 << 16:
            try:
                out = api.vbz_decompress(blob, size, opts)
                assert len(out) in (size, len(blob))
            except VbzError:
                pass
            size *= 2


def test_fuzz_truncations_of_valid_stream():
    rng = np.random.default_rng(7)
    sig = rng.integers(-3000, 3000, 5000, dtype=np.int16)
    for opts in (CompressionOptions(True, 2, 0, 0),
                 CompressionOptions(True, 2, 1, 0)):
        stream = api.vbz_compress_sized(sig, opts)
        for cut in [0, 1, 3, 4, 5, len(stream) // 2, len(stream) - 1]:
            try:
                api.vbz_decompress_sized(stream[:cut], opts)
            except VbzError:
                pass


def test_fuzz_bitflips_of_valid_stream():
    rng = np.random.default_rng(8)
    sig = rng.integers(-3000, 3000, 2000, dtype=np.int16)
    opts = CompressionOptions(True, 2, 0, 0)
    stream = bytearray(api.vbz_compress_sized(sig, opts))
    for _ in range(50):
        pos = rng.integers(0, len(stream))
        orig = stream[pos]
        stream[pos] ^= 1 << rng.integers(0, 8)
        try:
            out = api.vbz_decompress_sized(bytes(stream), opts)
            assert len(out) <= 2 * sig.nbytes
        except VbzError:
            pass
        stream[pos] = orig


def test_fuzz_native_agrees_on_adversarial(tmp_path):
    """Cross-implementation: the native C++ decoder and the Python oracle
    agree on accept/reject and on decoded bytes for random blobs."""
    from vbz_compression_tpu import native_backend as nb

    rng = np.random.default_rng(99)
    opts = CompressionOptions(True, 2, 0, 0)
    agree = 0
    for _ in range(100):
        blob = rng.integers(0, 256, rng.integers(4, 400),
                            dtype=np.uint8).tobytes()
        count_bytes = (len(blob) // 2) * 2
        py_out = py_err = None
        try:
            py_out = api.vbz_decompress(blob, count_bytes, opts)
        except VbzError as e:
            py_err = e.code
        nat_out = nat_err = None
        try:
            o = _native_decompress(nb, blob, count_bytes, opts)
            nat_out = o
        except VbzError as e:
            nat_err = e.code
        assert (py_err is None) == (nat_err is None), (py_err, nat_err)
        if py_err is None:
            assert py_out == nat_out
            agree += 1
    assert agree >= 0  # informational


def _native_decompress(nb, blob, dst_size, opts):
    import ctypes

    import numpy as np

    src = np.frombuffer(blob, dtype=np.uint8)
    out = np.empty(max(dst_size, 1), dtype=np.uint8)
    o = nb._COptions(bool(opts.perform_delta_zig_zag), opts.integer_size,
                     opts.zstd_compression_level, opts.vbz_version)
    r = nb.lib().vbz_decompress(
        src.ctypes.data_as(ctypes.c_void_p), src.size,
        out.ctypes.data_as(ctypes.c_void_p), dst_size, ctypes.byref(o))
    from vbz_compression_tpu.errors import vbz_is_error
    if vbz_is_error(r):
        raise VbzError(r)
    return out[:dst_size].tobytes()


REF_CORPUS = "/root/reference/vbz/fuzzing/fuzz_corpus"


@pytest.mark.skipif(not os.path.isdir(REF_CORPUS),
                    reason="reference corpus not mounted")
@pytest.mark.slow
def test_fuzz_reference_corpus_replay():
    """Replay the reference's checked-in 238-file fuzz corpus through the
    same two properties its harness applies per input
    (``vbz_fuzz_runner.cpp:26-58`` -> ``vbz_fuzz.cpp:63-161``): round-trip
    every config on the raw bytes, and adversarial decompress with doubling
    output-size probes."""
    files = sorted(os.listdir(REF_CORPUS))
    assert len(files) >= 200
    for fname in files:
        with open(os.path.join(REF_CORPUS, fname), "rb") as f:
            blob = f.read()
        data = blob[: len(blob) - (len(blob) % 4)]  # widths need %4 == 0
        for opts in CONFIGS:
            sized = api.vbz_compress_sized(data, opts)
            assert api.vbz_decompress_sized(sized, opts) == data
            size = 4
            while size <= 1 << 16:
                try:
                    out = api.vbz_decompress(blob, size, opts)
                    assert isinstance(out, bytes)  # no-crash property
                except VbzError:
                    pass
                size *= 2
