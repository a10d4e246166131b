"""Multi-host corpus driver tests (single process, 8-device CPU mesh)."""

import os

import numpy as np
import pytest

from vbz_compression_tpu import CompressionOptions, api
from vbz_compression_tpu.parallel import multihost

TEST_DATA = "/root/reference/test_data"


def test_compress_signals_matches_api():
    rng = np.random.default_rng(0)
    signals = [rng.integers(-3000, 3000, n, dtype=np.int16)
               for n in (5000, 12_000, 130_000, 7)]
    opts = CompressionOptions(True, 2, 1, 0)
    streams = multihost.compress_signals(signals, opts)
    assert len(streams) == len(signals)
    for sig, stream in zip(signals, streams):
        ref = api.vbz_compress_sized(sig, opts)
        assert stream == ref
        out = api.vbz_decompress_sized(stream, opts)
        np.testing.assert_array_equal(np.frombuffer(out, np.int16), sig)


@pytest.mark.skipif(not os.path.isdir(TEST_DATA),
                    reason="reference test_data not mounted")
def test_compress_corpus(tmp_path):
    stats = multihost.compress_corpus(
        [os.path.join(TEST_DATA, "multi_fast5_zip.fast5")],
        out_dir=str(tmp_path))
    assert stats.files == 1
    assert stats.reads == 10
    assert stats.raw_bytes == 3_097_862
    # Must beat the reference's stored size (1,308,058 incl. headers).
    assert stats.compressed_bytes <= 1_308_058
    assert (tmp_path / "multi_fast5_zip.fast5.vbz").exists()
