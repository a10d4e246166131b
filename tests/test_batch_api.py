"""Bulk batch API: vbz_compress_sized_batch / vbz_decompress_sized_batch
must agree byte-for-byte with the per-chunk pipeline for every backend and
option combination (BASELINE config: bulk multi-read batch)."""

import numpy as np
import pytest

from vbz_compression_tpu import api
from vbz_compression_tpu.models.codec import jax_backend, pallas_backend
from vbz_compression_tpu.options import CompressionOptions
from vbz_compression_tpu.ops import scalar


def _chunks(dtype, k=5, seed=0):
    rng = np.random.default_rng(seed)
    out = []
    for i in range(k):
        n = int(rng.integers(1, 30_000))
        if np.dtype(dtype).kind == "i":
            info = np.iinfo(dtype)
            sig = np.clip(np.cumsum(rng.normal(0, max(info.max // 300, 2), n)),
                          info.min, info.max).astype(dtype)
        else:
            sig = rng.integers(0, np.iinfo(dtype).max, n).astype(dtype)
        out.append(sig)
    out.append(np.zeros(0, dtype))  # empty chunk edge case
    return out


BACKENDS = [("scalar", scalar), ("jax", jax_backend),
            ("pallas", pallas_backend)]


@pytest.mark.parametrize("backend_name,backend", BACKENDS)
@pytest.mark.parametrize("dtype,int_size,zigzag", [
    (np.int16, 2, True), (np.uint32, 4, False), (np.int8, 1, True),
])
@pytest.mark.parametrize("level,version", [(0, 0), (1, 0), (1, 1)])
def test_batch_matches_per_chunk(backend_name, backend, dtype, int_size,
                                 zigzag, level, version):
    opts = CompressionOptions(zigzag, int_size, level, version)
    chunks = _chunks(dtype, k=3)
    batch = api.vbz_compress_sized_batch(chunks, opts, backend=backend)
    single = [api.vbz_compress_sized(c, opts, backend=backend)
              for c in chunks]
    assert batch == single
    back = api.vbz_decompress_sized_batch(batch, opts, backend=backend)
    for c, b in zip(chunks, back):
        assert np.array_equal(np.frombuffer(b, dtype), c)


def test_batch_no_svb_stage():
    # integer_size=0: raw copy (+ optional zstd) with sized header.
    opts = CompressionOptions(False, 0, 1, 0)
    chunks = [np.arange(100, dtype=np.int16), np.zeros(0, np.int16)]
    batch = api.vbz_compress_sized_batch(chunks, opts)
    single = [api.vbz_compress_sized(c, opts) for c in chunks]
    assert batch == single
    back = api.vbz_decompress_sized_batch(batch, opts)
    for c, b in zip(chunks, back):
        assert np.array_equal(np.frombuffer(b, np.int16), c)
