"""Cross-check the JAX/XLA data plane against the NumPy oracle — bit-exact
stream equality, not just round-trip."""

import numpy as np
import pytest

from vbz_compression_tpu import CompressionOptions, VbzError, api
from vbz_compression_tpu.models.codec import jax_backend
from vbz_compression_tpu.ops import scalar

DTYPES = [np.int8, np.int16, np.int32, np.uint8, np.uint16, np.uint32]


def _random(dtype, size, seed=0):
    rng = np.random.default_rng(seed)
    info = np.iinfo(dtype)
    return rng.integers(info.min, info.max + 1, size=size, dtype=dtype)


@pytest.mark.parametrize("dtype", DTYPES)
@pytest.mark.parametrize("zigzag", [False, True])
def test_encode_bit_exact_vs_oracle(dtype, zigzag):
    data = _random(dtype, 10_000)
    size = data.dtype.itemsize
    ours = jax_backend.svb_compress(data, size, zigzag, 0)
    ref = scalar.svb_compress(data, size, zigzag, 0)
    assert ours == ref


@pytest.mark.parametrize("dtype", DTYPES)
@pytest.mark.parametrize("zigzag", [False, True])
def test_decode_bit_exact_vs_oracle(dtype, zigzag):
    data = _random(dtype, 10_000, seed=5)
    size = data.dtype.itemsize
    stream = scalar.svb_compress(data, size, zigzag, 0)
    ours = jax_backend.svb_decompress(stream, data.size, size, zigzag, 0)
    np.testing.assert_array_equal(ours.view(dtype), data)


@pytest.mark.parametrize("n", [0, 1, 3, 4, 5, 7, 8, 4095, 4096, 4097])
def test_ragged_sizes_int16(n):
    data = _random(np.int16, n, seed=n)
    ours = jax_backend.svb_compress(data, 2, True, 0)
    ref = scalar.svb_compress(data, 2, True, 0)
    assert ours == ref
    rt = jax_backend.svb_decompress(ours, n, 2, True, 0)
    np.testing.assert_array_equal(rt, data)


def test_wraparound_boundary_int16():
    data = np.array([-32768, 32767, -32768, 32767, 0, 32767, -32768],
                    dtype=np.int16)
    assert (jax_backend.svb_compress(data, 2, True, 0)
            == scalar.svb_compress(data, 2, True, 0))


def test_malformed_stream_raises():
    with pytest.raises(VbzError):
        jax_backend.svb_decompress(b"\x00\x01\x02\x03\x04\x05", 4, 2, True, 0)


@pytest.mark.slow
def test_api_pipeline_with_jax_backend():
    sig = _random(np.int16, 123_456, seed=9)
    opts = CompressionOptions(True, 2, 1, 0)
    ours = api.vbz_compress_sized(sig, opts, backend=jax_backend)
    ref = api.vbz_compress_sized(sig, opts, backend=scalar)
    assert ours == ref
    rt = api.vbz_decompress_sized(ours, opts, backend=jax_backend)
    np.testing.assert_array_equal(np.frombuffer(rt, np.int16), sig)


@pytest.mark.slow
def test_fast5_corpus_jax_backend():
    import os
    from vbz_compression_tpu.utils import hdf5_chunks
    td = "/root/reference/test_data"
    if not os.path.isdir(td):
        pytest.skip("reference test_data not mounted")
    gz = hdf5_chunks.read_gzip_signals(os.path.join(td, "multi_fast5_zip.fast5"))
    n = 0
    for name, opts, chunk, _ in hdf5_chunks.iter_vbz_signal_chunks(
            os.path.join(td, "multi_fast5_vbz.fast5")):
        out = api.vbz_decompress_sized(chunk, opts, backend=jax_backend)
        np.testing.assert_array_equal(np.frombuffer(out, np.int16), gz[name])
        ours = api.vbz_compress_sized(gz[name], opts, backend=jax_backend)
        ref = api.vbz_compress_sized(gz[name], opts, backend=scalar)
        assert ours == ref
        n += 1
    assert n == 10


@pytest.mark.parametrize("dtype", [np.int8, np.uint8])
@pytest.mark.parametrize("zigzag", [False, True])
def test_v1_halfbyte_bit_exact_vs_oracle(dtype, zigzag):
    data = _random(dtype, 10_000, seed=21)
    ours = jax_backend.svb_compress(data, 1, zigzag, 1)
    ref = scalar.svb_compress(data, 1, zigzag, 1)
    assert ours == ref
    rt = jax_backend.svb_decompress(ours, data.size, 1, zigzag, 1)
    np.testing.assert_array_equal(rt.view(dtype), data)


@pytest.mark.parametrize("n", [1, 3, 4, 5, 4095, 4096, 4097])
def test_v1_ragged_sizes(n):
    data = _random(np.int8, n, seed=n + 100)
    ours = jax_backend.svb_compress(data, 1, True, 1)
    ref = scalar.svb_compress(data, 1, True, 1)
    assert ours == ref
    rt = jax_backend.svb_decompress(ours, n, 1, True, 1)
    np.testing.assert_array_equal(rt, data)


def test_v1_sparse_zeros():
    # code-0 (zero byte) handling: mostly-zero int8 stream.
    rng = np.random.default_rng(3)
    data = (rng.random(5000) < 0.05).astype(np.int8) * rng.integers(
        -100, 100, 5000).astype(np.int8)
    ours = jax_backend.svb_compress(data, 1, True, 1)
    ref = scalar.svb_compress(data, 1, True, 1)
    assert ours == ref


def test_pallas_backend_v1_and_w4_routes_interpret(monkeypatch):
    """The TPU-only v1/W4 dispatch in PallasSvbBackend, driven under
    interpret mode (CI has no chip; the on-chip byte-parity is covered by
    the flavors gate)."""
    from jax.experimental.pallas import tpu as pltpu

    from vbz_compression_tpu.models import codec as mcodec

    b = mcodec.PallasSvbBackend()
    monkeypatch.setattr(b, "_pallas_ok", lambda: True)
    rng = np.random.default_rng(8)
    cases = [
        (np.clip(np.cumsum(rng.normal(0, 3, 16384)), -100,
                 100).astype(np.int8), 1, True, 1),       # v1 zz8
        (rng.integers(0, 120, 16384, dtype=np.int8), 1, False, 1),
        (np.cumsum(rng.integers(-2000, 2000, 16384)).astype(np.int32),
         4, True, 0),                                      # W4 zz32
        (rng.integers(-2000, 2000, 16384).astype(np.int16), 2, False, 0),
    ]
    for sig, isz, zz, ver in cases:
        with pltpu.force_tpu_interpret_mode():
            st = b.svb_compress(sig, isz, zz, ver)
            assert st == scalar.svb_compress(sig, isz, zz, ver)
            out = b.svb_decompress(np.frombuffer(st, np.uint8), sig.size,
                                   isz, zz, ver)
        np.testing.assert_array_equal(out, sig)
