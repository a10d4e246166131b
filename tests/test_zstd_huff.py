"""From-scratch zstd frame encoder tests — every frame must decode with the
stock libzstd decoder (the same library the reference links), proving frame
compatibility of the native entropy stage."""

import numpy as np
import pytest

from vbz_compression_tpu.ops import scalar, zstd_huff


def _decode(frame: bytes, expect: int) -> bytes:
    import zstandard

    return zstandard.ZstdDecompressor().decompress(
        frame, max_output_size=max(expect, 1))


CASES = {}
_rng = np.random.default_rng(0)
CASES["skewed"] = _rng.choice(
    np.arange(8, dtype=np.uint8),
    p=[.5, .2, .1, .08, .05, .04, .02, .01], size=5000).tobytes()
CASES["text"] = bytes(_rng.choice(list(b"abcdefgh etaoinshrdlu."), size=24000))
CASES["uniform"] = _rng.integers(0, 256, 2000, dtype=np.uint8).tobytes()
CASES["constant"] = b"\x07" * 5000
CASES["empty"] = b""
CASES["tiny"] = b"ab"
CASES["runs"] = b"\x00" * 100 + b"abcabc" * 50 + b"\xff" * 1000
CASES["large"] = _rng.choice(
    np.arange(16, dtype=np.uint8), size=600_000).tobytes()
_sig = np.clip(500 + np.cumsum(_rng.normal(0, 12, 100_000)),
               -2000, 2000).astype(np.int16)
CASES["svb_payload"] = scalar.svb_compress(_sig, 2, True, 0)


@pytest.mark.parametrize("name", sorted(CASES))
def test_frame_decodes_with_libzstd(name):
    data = CASES[name]
    frame = zstd_huff.compress_frame(data)
    assert _decode(frame, len(data)) == data


def test_frame_content_size_readable():
    import zstandard

    data = CASES["skewed"]
    frame = zstd_huff.compress_frame(data)
    params = zstandard.get_frame_parameters(frame)
    assert params.content_size == len(data)


def test_compresses_skewed_data():
    data = CASES["skewed"]
    frame = zstd_huff.compress_frame(data)
    assert len(frame) < 0.5 * len(data)


def test_rle_block_efficiency():
    frame = zstd_huff.compress_frame(CASES["constant"])
    assert len(frame) < 30


def test_pipeline_with_native_entropy_engine():
    """The sized vbz pipeline with our own entropy stage still decodes with
    the standard path (zstd interop both ways)."""
    from vbz_compression_tpu import CompressionOptions, api

    sig = _sig
    opts = CompressionOptions(True, 2, 1, 0)
    svb = api.vbz_compress(sig, CompressionOptions(True, 2, 0, 0))
    frame = zstd_huff.compress_frame(svb)
    import struct

    stream = struct.pack("<I", sig.nbytes) + frame
    out = api.vbz_decompress_sized(stream, opts)
    np.testing.assert_array_equal(np.frombuffer(out, np.int16), sig)


def test_fse_weight_table_wide_alphabet():
    """Full-byte alphabets need FSE-compressed Huffman weights; the frames
    must still decode with stock libzstd."""
    rng = np.random.default_rng(5)
    p = np.r_[np.full(64, 12.0), np.full(192, 1.0)]
    data = rng.choice(np.arange(256, dtype=np.uint8), p=p / p.sum(),
                      size=50_000).tobytes()
    frame = zstd_huff.compress_frame(data)
    assert _decode(frame, len(data)) == data
    assert len(frame) < 0.95 * len(data)


def test_fse_primitives_roundtrip():
    from vbz_compression_tpu.ops import fse

    rng = np.random.default_rng(7)
    for _ in range(30):
        n = int(rng.integers(4, 250))
        w = rng.integers(0, 12, n)
        if len(set(w.tolist())) < 2:
            continue
        payload = fse.compress_weights(w)
        if payload is None:
            continue
        assert fse.decompress_weights(payload) == w.tolist()


def test_fse_norm_count_serialization():
    from vbz_compression_tpu.ops import fse

    rng = np.random.default_rng(8)
    for _ in range(50):
        nsym = int(rng.integers(2, 30))
        freqs = rng.integers(0, 50, nsym)
        freqs[rng.integers(0, nsym)] += 50
        if (freqs > 0).sum() < 2:
            continue
        norm = fse.normalize_counts(freqs, 6)
        desc = fse.write_norm_counts(norm, 6)
        got, al, _ = fse.read_norm_counts(desc)
        nz = int(np.nonzero(norm)[0][-1]) + 1
        assert got[:nz] == norm.tolist()[:nz] and al == 6
