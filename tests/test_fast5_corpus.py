"""Cross-era compatibility oracle: decode the reference's checked-in fast5
corpora (written by the reference C++/SSE codec) and re-encode bit-exactly.

Mirrors ``python/test/test_vbz_filter.py:57-73`` (TestVbzStoredFiles), but
without needing any HDF5 filter plugin: raw chunk bytes are read directly.
"""

import os

import numpy as np
import pytest

from vbz_compression_tpu import CompressionOptions, api
from vbz_compression_tpu.utils import hdf5_chunks

TEST_DATA = "/root/reference/test_data"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(TEST_DATA), reason="reference test_data not mounted")


@pytest.fixture(scope="module")
def gzip_signals():
    return hdf5_chunks.read_gzip_signals(os.path.join(TEST_DATA,
                                                      "multi_fast5_zip.fast5"))


@pytest.mark.parametrize("fname", ["multi_fast5_vbz.fast5",
                                   "multi_fast5_vbz_v1.fast5"])
def test_decode_reference_vbz_chunks(fname, gzip_signals):
    path = os.path.join(TEST_DATA, fname)
    n = 0
    for name, opts, chunk, n_elems in hdf5_chunks.iter_vbz_signal_chunks(path):
        out = api.vbz_decompress_sized(chunk, opts)
        signal = np.frombuffer(out, dtype=np.int16)
        np.testing.assert_array_equal(signal, gzip_signals[name])
        assert signal.size == n_elems
        n += 1
    assert n == 10  # 10 reads in the corpus


@pytest.mark.parametrize("fname", ["multi_fast5_vbz.fast5",
                                   "multi_fast5_vbz_v1.fast5"])
def test_reencode_matches_reference_svb_bytes(fname, gzip_signals):
    """The StreamVByte stage of our encoder must be bit-identical to the
    reference SSE encoder's output embedded in the shipped zstd frames."""
    path = os.path.join(TEST_DATA, fname)
    for name, opts, chunk, _n in hdf5_chunks.iter_vbz_signal_chunks(path):
        payload = chunk[api.SIZED_HEADER_BYTES:]
        assert opts.zstd_compression_level != 0
        ref_svb = api.zstd_decompress(
            payload, api.zstd_frame_content_size(payload))
        signal = gzip_signals[name]
        ours = api.vbz_compress(
            signal, CompressionOptions(opts.perform_delta_zig_zag,
                                       opts.integer_size, 0, opts.vbz_version))
        assert ours == ref_svb, f"svb bytes differ for {name}"


@pytest.mark.parametrize("fname", ["multi_fast5_vbz.fast5",
                                   "multi_fast5_vbz_v1.fast5"])
def test_reencode_size_at_most_reference(fname, gzip_signals):
    """Full-pipeline re-encode must be ≤ the reference stored chunk size
    (BASELINE.md north-star)."""
    path = os.path.join(TEST_DATA, fname)
    total_ours = total_ref = 0
    for name, opts, chunk, _n in hdf5_chunks.iter_vbz_signal_chunks(path):
        ours = api.vbz_compress_sized(gzip_signals[name], opts)
        total_ours += len(ours)
        total_ref += len(chunk)
    assert total_ours <= total_ref, (total_ours, total_ref)
