"""Native (dlopen-HDF5) fast5 chunk iterator vs the h5py path and the
reference corpus ground truth."""

import os
import subprocess

import numpy as np
import pytest

from tests.conftest import REFERENCE_TEST_DATA

NATIVE = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "native")


@pytest.fixture(scope="module")
def reader():
    if not os.path.exists(os.path.join(NATIVE, "libfast5_reader.so")):
        rc = subprocess.run(["make", "-C", NATIVE, "libfast5_reader.so",
                             "-s"]).returncode
        if rc != 0:
            pytest.skip("native reader build failed")
    from vbz_compression_tpu.utils import native_fast5

    try:
        native_fast5._load()
    except OSError as exc:
        pytest.skip(f"no usable libhdf5: {exc}")
    return native_fast5


def test_chunks_match_h5py(reader):
    h5py = pytest.importorskip("h5py")
    path = os.path.join(REFERENCE_TEST_DATA, "multi_fast5_vbz.fast5")
    with reader.Fast5File(path) as f:
        names = f.signal_names()
        assert len(names) == 10
        with h5py.File(path, "r") as hf:
            for name in names:
                ds = hf[name]
                raw, loff, mask = f.read_chunk(name, 0)
                fm, ref_bytes = ds.id.read_direct_chunk((0,))
                assert raw == ref_bytes
                assert mask == fm == 0
                assert loff == 0
                info = f.dataset_info(name)
                assert info.nelems == ds.shape[0]
                assert info.filter_id == 32020
                assert tuple(ds._filters["32020"]) == info.cd_values


def test_decode_reference_corpus(reader):
    from vbz_compression_tpu import api
    from vbz_compression_tpu.utils import hdf5_chunks

    gz = hdf5_chunks.read_gzip_signals(
        os.path.join(REFERENCE_TEST_DATA, "multi_fast5_zip.fast5"))
    for fname in ("multi_fast5_vbz.fast5", "multi_fast5_vbz_v1.fast5"):
        n = 0
        for name, info, raw in reader.iter_signal_chunks(
                os.path.join(REFERENCE_TEST_DATA, fname)):
            opts = reader.options_from_cd(info.cd_values)
            out = np.frombuffer(api.vbz_decompress_sized(raw, opts), np.int16)
            assert np.array_equal(out, gz[name.split("/")[0]])
            n += 1
        assert n == 10
