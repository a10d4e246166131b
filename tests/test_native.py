"""Native C++ runtime tests: C-ABI parity, bit-exactness vs the oracle, and
HDF5 plugin integration through h5py."""

import os
import subprocess

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
NATIVE = os.path.join(REPO, "native")
LIB = os.path.join(NATIVE, "libvbz_native.so")
PLUGIN = os.path.join(NATIVE, "libvbz_hdf_plugin.so")


@pytest.fixture(scope="module", autouse=True)
def build_native():
    subprocess.run(["make", "-C", NATIVE, "-s"], check=True)


from vbz_compression_tpu import CompressionOptions, api  # noqa: E402
from vbz_compression_tpu.ops import scalar  # noqa: E402


def _nb():
    from vbz_compression_tpu import native_backend
    return native_backend


@pytest.mark.parametrize("dtype", [np.int8, np.int16, np.int32, np.uint16])
@pytest.mark.parametrize("zigzag", [False, True])
@pytest.mark.parametrize("version", [0, 1])
def test_native_svb_bit_exact(dtype, zigzag, version):
    nb = _nb()
    rng = np.random.default_rng(11)
    info = np.iinfo(dtype)
    data = rng.integers(info.min, info.max + 1, size=20_000, dtype=dtype)
    size = data.dtype.itemsize
    ours = nb.native_backend.svb_compress(data, size, zigzag, version)
    ref = scalar.svb_compress(data, size, zigzag, version)
    assert ours == ref
    rt = nb.native_backend.svb_decompress(ours, data.size, size, zigzag,
                                          version)
    np.testing.assert_array_equal(rt.view(dtype), data)


def test_native_sized_pipeline_matches_python():
    nb = _nb()
    rng = np.random.default_rng(2)
    sig = rng.integers(-3000, 3000, size=50_000, dtype=np.int16)
    opts = CompressionOptions(True, 2, 0, 0)  # no zstd: byte-exact everywhere
    ours = nb.vbz_compress_sized(sig, opts)
    ref = api.vbz_compress_sized(sig, opts)
    assert ours == ref
    rt = nb.vbz_decompress_sized(ours, opts)
    np.testing.assert_array_equal(np.frombuffer(rt, np.int16), sig)
    # zstd path round-trips across implementations (bytes may differ by
    # encoder profile, decode must interop both ways).
    opts_z = CompressionOptions(True, 2, 1, 0)
    native_stream = nb.vbz_compress_sized(sig, opts_z)
    py_stream = api.vbz_compress_sized(sig, opts_z)
    np.testing.assert_array_equal(
        np.frombuffer(api.vbz_decompress_sized(native_stream, opts_z), np.int16), sig)
    np.testing.assert_array_equal(
        np.frombuffer(nb.vbz_decompress_sized(py_stream, opts_z), np.int16), sig)


def _register_plugin_path():
    import h5py

    paths = [h5py.h5pl.get(i).decode() for i in range(h5py.h5pl.size())]
    if NATIVE not in paths:
        h5py.h5pl.prepend(NATIVE.encode())


def test_hdf5_plugin_roundtrip(tmp_path):
    import h5py

    _register_plugin_path()
    sig = np.arange(-20_000, 30_000, dtype=np.int16)
    path = str(tmp_path / "t.h5")
    with h5py.File(path, "w") as f:
        for tag, ver in (("v0", 0), ("v1", 1)):
            f.create_dataset(tag, data=sig, chunks=(sig.size,),
                             compression=32020,
                             compression_opts=(ver, 2, 1, 1))
    with h5py.File(path) as f:
        for tag in ("v0", "v1"):
            np.testing.assert_array_equal(f[tag][...], sig)


def test_hdf5_plugin_reads_reference_fast5():
    import h5py

    td = "/root/reference/test_data"
    if not os.path.isdir(td):
        pytest.skip("reference test_data not mounted")
    _register_plugin_path()
    with h5py.File(os.path.join(td, "multi_fast5_vbz.fast5")) as f, \
            h5py.File(os.path.join(td, "multi_fast5_zip.fast5")) as g:
        for name in f.keys():
            np.testing.assert_array_equal(f[name]["Raw/Signal"][...],
                                          g[name]["Raw/Signal"][...])


def test_h5py_helpers_roundtrip(tmp_path):
    import h5py

    from vbz_compression_tpu.utils import h5py_helpers as vbz5

    assert vbz5.register_plugin()
    sig = np.arange(-5000, 5000, dtype=np.int16)
    path = str(tmp_path / "helper.h5")
    with h5py.File(path, "w") as f:
        f.create_dataset("s", data=sig, chunks=(sig.size,),
                         **vbz5.dataset_opts())
    with h5py.File(path) as f:
        np.testing.assert_array_equal(f["s"][...], sig)
        opts = vbz5.options_of(f["s"])
        assert opts.integer_size == 2 and opts.perform_delta_zig_zag


def test_h5repack_cli(tmp_path):
    """Reference parity for python/test/test_repack.py. Uses the HDF5
    tools' h5repack when installed; otherwise the bundled
    h5repack-compatible CLI (same UD= spec, same libhdf5 plugin-load
    path) so the repack contract is always exercised, never skipped."""
    import shutil
    import sys

    import h5py

    src = str(tmp_path / "in.h5")
    dst = str(tmp_path / "out.h5")
    sig = np.arange(0, 50000, dtype=np.int16)
    with h5py.File(src, "w") as f:
        f.create_dataset("s", data=sig, chunks=(sig.size,))
    env = dict(os.environ, HDF5_PLUGIN_PATH=NATIVE)
    if shutil.which("h5repack") is not None:
        cmd = ["h5repack", "-f", "UD=32020,0,4,0,2,1,1", src, dst]
    else:
        cmd = [sys.executable, "-m",
               "vbz_compression_tpu.tools.h5repack_vbz",
               "-f", "UD=32020,0,4,0,2,1,1", src, dst]
        env["PYTHONPATH"] = os.path.dirname(NATIVE)
    r = subprocess.run(cmd, env=env, capture_output=True)
    assert r.returncode == 0, r.stderr
    with h5py.File(dst) as f:
        np.testing.assert_array_equal(f["s"][...], sig)
        # The rewritten dataset really is vbz-compressed (filter persisted).
        assert "32020" in f["s"]._filters


def test_native_selftest_binary():
    """The C++ unit suite (golden vectors + sweeps, counterpart of the
    reference's Catch2 tests) must pass."""
    subprocess.run(["make", "-C", NATIVE, "-s", "vbz_selftest"], check=True)
    out = subprocess.run([os.path.join(NATIVE, "vbz_selftest")],
                         capture_output=True, text=True)
    assert out.returncode == 0, out.stderr
    assert "all tests passed" in out.stdout


def test_native_selftest_asan():
    """The same unit suite under ASan+UBSan (the reference applies its
    sanitizer kit to every test target, cmake/FindSanitizers.cmake)."""
    b = subprocess.run(["make", "-C", NATIVE, "-s", "vbz_selftest_asan"],
                       capture_output=True, text=True)
    if b.returncode != 0:
        pytest.skip(f"sanitizer toolchain unavailable: {b.stderr[-200:]}")
    out = subprocess.run([os.path.join(NATIVE, "vbz_selftest_asan")],
                         capture_output=True, text=True)
    assert out.returncode == 0, out.stderr
    assert "all tests passed" in out.stdout


def test_native_tsan_smoke():
    """Concurrent per-chunk pipeline use under ThreadSanitizer — the shape
    the Python batch API drives through its thread pool (counterpart of
    the reference's SANITIZE_THREAD option, cmake/FindTSan.cmake)."""
    b = subprocess.run(["make", "-C", NATIVE, "-s", "vbz_tsan_smoke"],
                       capture_output=True, text=True)
    if b.returncode != 0:
        pytest.skip(f"TSan toolchain unavailable: {b.stderr[-200:]}")
    out = subprocess.run([os.path.join(NATIVE, "vbz_tsan_smoke")],
                         capture_output=True, text=True)
    assert out.returncode == 0, out.stderr
    assert "all threads round-tripped" in out.stdout
