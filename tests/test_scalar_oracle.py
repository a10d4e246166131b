"""Golden-vector and property tests for the NumPy oracle codec.

Golden byte vectors come from the reference unit tests
(``vbz/test/streamvbyte_test.cpp:203-239``, ``vbz/test/vbz_test.cpp:176-350``).
"""

import numpy as np
import pytest

from vbz_compression_tpu import CompressionOptions, VbzError, api
from vbz_compression_tpu.ops import scalar

# ---------------------------------------------------------------------------
# Golden vectors
# ---------------------------------------------------------------------------


def test_golden_int16_zigzag_v0():
    # streamvbyte_test.cpp:207-212
    values = np.array([0, -1, 4, -9, 16, -25, 36, -49, 64, -81, 100],
                      dtype=np.int16)
    expected = np.array([0, 0, 20, 0, 1, 10, 25, 50, 81, 122, -87, -30, 33, 1,
                         106, 1], dtype=np.int8).tobytes()
    out = scalar.svb_compress(values, 2, True, version=0)
    assert out == expected
    rt = scalar.svb_decompress(out, values.size, 2, True, version=0)
    np.testing.assert_array_equal(rt, values)


def test_golden_int16_zigzag_v1_delegates_to_v0():
    # streamvbyte_test.cpp:215-219 — int16 v1 output is identical to v0.
    values = np.array([0, -1, 4, -9, 16, -25, 36, -49, 64, -81, 100],
                      dtype=np.int16)
    v0 = scalar.svb_compress(values, 2, True, version=0)
    v1 = scalar.svb_compress(values, 2, True, version=1)
    assert v0 == v1
    rt = scalar.svb_decompress(v1, values.size, 2, True, version=1)
    np.testing.assert_array_equal(rt, values)


def test_golden_uint16_no_zigzag():
    # streamvbyte_test.cpp:225-237
    values = np.array([0, 1, 4, 9, 16, 25, 36, 49, 64, 81, 100],
                      dtype=np.uint16)
    expected = bytes([0, 0, 0, 0, 1, 4, 9, 16, 25, 36, 49, 64, 81, 100])
    for version in (0, 1):
        out = scalar.svb_compress(values, 2, False, version=version)
        assert out == expected
        rt = scalar.svb_decompress(out, values.size, 2, False, version=version)
        np.testing.assert_array_equal(rt.view(np.uint16), values)


def test_golden_int32_zigzag_core_api():
    # vbz_test.cpp:176-209
    values = np.array([5, 4, 3, 2, 1], dtype=np.int32)
    opts = CompressionOptions(True, 4, 0, 0)
    out = api.vbz_compress(values, opts)
    assert out == bytes([0, 0, 10, 1, 1, 1, 1])
    rt = api.vbz_decompress(out, values.nbytes, opts)
    np.testing.assert_array_equal(np.frombuffer(rt, np.int32), values)


def test_golden_int32_zigzag_zstd_level100():
    # vbz_test.cpp:212-244 — level 100 on 7 bytes yields a raw zstd block.
    values = np.array([5, 4, 3, 2, 1], dtype=np.int32)
    opts = CompressionOptions(True, 4, 100, 0)
    out = api.vbz_compress(values, opts)
    expected = np.array([40, -75, 47, -3, 32, 7, 57, 0, 0, 0, 0, 10, 1, 1, 1, 1],
                        dtype=np.int8).tobytes()
    assert out == expected
    rt = api.vbz_decompress(out, values.nbytes, opts)
    np.testing.assert_array_equal(np.frombuffer(rt, np.int32), values)


def test_golden_sized_framing():
    # vbz_test.cpp:290-350 — sized stream prepends {20,0,0,0}.
    values = np.array([5, 4, 3, 2, 1], dtype=np.int32)
    opts = CompressionOptions(True, 4, 0, 0)
    out = api.vbz_compress_sized(values, opts)
    assert out == bytes([20, 0, 0, 0, 0, 0, 10, 1, 1, 1, 1])
    assert api.vbz_decompressed_size(out, opts) == 20
    rt = api.vbz_decompress_sized(out, opts)
    np.testing.assert_array_equal(np.frombuffer(rt, np.int32), values)


def test_golden_v1_int8_nibble_stream():
    # Hand-derived from the v1 wire format (v1/impl.h:112-125): values
    # 0→code0, 3→code1 (nibble 3), 20→code2 (nibbles 4,1), 255→code2 (F,F).
    values = np.array([0, 3, 20, 255], dtype=np.uint32)
    out = scalar.svb1_encode(values)
    assert out == bytes([0b10100100, 0x43, 0xF1, 0x0F])
    rt = scalar.svb1_decode(out, 4)
    np.testing.assert_array_equal(rt, values)


# ---------------------------------------------------------------------------
# Round-trip property suites (mirror streamvbyte_test.cpp:98-135)
# ---------------------------------------------------------------------------

DTYPES = [np.int8, np.int16, np.int32, np.uint8, np.uint16, np.uint32]


@pytest.mark.parametrize("dtype", DTYPES)
@pytest.mark.parametrize("zigzag", [False, True])
@pytest.mark.parametrize("version", [0, 1])
def test_roundtrip_iota(dtype, zigzag, version):
    data = np.arange(100).astype(dtype)
    size = data.dtype.itemsize
    out = scalar.svb_compress(data, size, zigzag, version)
    rt = scalar.svb_decompress(out, data.size, size, zigzag, version)
    np.testing.assert_array_equal(rt.view(dtype), data)


@pytest.mark.parametrize("dtype", DTYPES)
@pytest.mark.parametrize("version", [0, 1])
def test_roundtrip_random(dtype, version):
    rng = np.random.default_rng(1234)
    info = np.iinfo(dtype)
    data = rng.integers(info.min // 2, info.max // 2 + 1, size=100_000,
                        dtype=dtype)
    size = data.dtype.itemsize
    zigzag = np.issubdtype(dtype, np.signedinteger)
    out = scalar.svb_compress(data, size, zigzag, version)
    rt = scalar.svb_decompress(out, data.size, size, zigzag, version)
    np.testing.assert_array_equal(rt.view(dtype), data)


def test_roundtrip_int16_wraparound_boundary():
    # SURVEY.md hard-parts: ±32768 swings exercise the 16-bit wrapped deltas.
    data = np.array([-32768, 32767, -32768, 32767, 0, 32767, -32768, 1, -1,
                     -32768], dtype=np.int16)
    out = scalar.svb_compress(data, 2, True, version=0)
    rt = scalar.svb_decompress(out, data.size, 2, True, version=0)
    np.testing.assert_array_equal(rt, data)
    # 16-bit wrap means every encoded value fits 2 bytes → codes ∈ {0,1}.
    codes = scalar.unpack_keys(
        np.frombuffer(out[: (data.size + 3) // 4], np.uint8), data.size)
    assert codes.max() <= 1


@pytest.mark.parametrize("version", [0, 1])
def test_empty_input(version):
    out = scalar.svb_compress(np.zeros(0, np.int16), 2, True, version)
    assert out == b""
    rt = scalar.svb_decompress(b"", 0, 2, True, version)
    assert rt.size == 0


def test_malformed_streams_raise():
    with pytest.raises(VbzError):
        scalar.svb_decompress(b"\x00", 8, 2, True, 0)  # keys longer than input
    with pytest.raises(VbzError):
        scalar.svb_decompress(b"\x00\x01\x02\x03\x04\x05", 4, 2, True, 0)  # extra data
    with pytest.raises(VbzError):
        scalar.svb1_decode(b"\xff", 4)  # not enough data nibbles


# ---------------------------------------------------------------------------
# API-level option space sweep (mirrors vbz_fuzz.cpp:174-191 lattice)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("integer_size", [0, 1, 2, 4])
@pytest.mark.parametrize("zigzag", [False, True])
@pytest.mark.parametrize("zstd_level", [0, 1])
@pytest.mark.parametrize("version", [0, 1])
def test_api_roundtrip_lattice(integer_size, zigzag, zstd_level, version):
    rng = np.random.default_rng(7)
    nbytes = 4096
    data = rng.integers(0, 256, size=nbytes, dtype=np.uint8).tobytes()
    opts = CompressionOptions(zigzag, integer_size, zstd_level, version)
    bound = api.vbz_max_compressed_size(nbytes, opts)
    sized = api.vbz_compress_sized(data, opts)
    assert len(sized) <= bound
    rt = api.vbz_decompress_sized(sized, opts)
    assert rt == data
    # Unsized path too.
    unsized = api.vbz_compress(data, opts)
    rt2 = api.vbz_decompress(unsized, nbytes, opts)
    assert rt2 == data


def test_invalid_options():
    with pytest.raises(VbzError):
        api.vbz_compress(b"1234", CompressionOptions(True, 3, 0, 0))
    with pytest.raises(VbzError):
        api.vbz_compress(b"1234", CompressionOptions(True, 2, 0, 7))
    with pytest.raises(VbzError):
        api.vbz_decompressed_size(b"123", CompressionOptions(True, 2, 0, 0))


def test_pyvbz_compat_api():
    rng = np.random.default_rng(3)
    sig = rng.integers(-2000, 2000, size=15000, dtype=np.int16)
    compressed = api.compress(sig)
    assert compressed.dtype == np.uint8
    rt = api.decompress(compressed.tobytes(), np.int16)
    np.testing.assert_array_equal(rt, sig)
