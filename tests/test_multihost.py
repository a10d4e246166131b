"""Multi-host corpus driver tests (single process, 8-device CPU mesh)."""

import os

import numpy as np
import pytest

from vbz_compression_tpu import CompressionOptions, api
from vbz_compression_tpu.parallel import multihost

TEST_DATA = "/root/reference/test_data"


@pytest.mark.parametrize("plane", ["xla", "pallas"])
def test_compress_signals_matches_api(plane):
    """Both device planes must produce byte-identical sized streams vs the
    single-chunk api path. The random +-3000 signals overflow the Pallas
    compact budget on every row, so the pallas case also exercises the
    per-row general-kernel fallback."""
    rng = np.random.default_rng(0)
    signals = [rng.integers(-3000, 3000, n, dtype=np.int16)
               for n in (5000, 12_000, 130_000, 7)]
    opts = CompressionOptions(True, 2, 1, 0)
    streams = multihost.compress_signals(signals, opts, plane=plane)
    assert len(streams) == len(signals)
    for sig, stream in zip(signals, streams):
        ref = api.vbz_compress_sized(sig, opts)
        assert stream == ref
        out = api.vbz_decompress_sized(stream, opts)
        np.testing.assert_array_equal(np.frombuffer(out, np.int16), sig)


def test_overflow_fallback_batched(monkeypatch):
    """A majority-overflow bucket re-encodes ALL overflowing rows in ONE
    batched general-kernel call, not a per-row device-call loop (a dense
    corpus would otherwise degrade to B dispatches — VERDICT r4 #7)."""
    from vbz_compression_tpu.ops import pallas_dense as pcd

    general_calls = []
    orig = pcd.encode_w2_dense_rows_flat

    def counting(x2, batch, **kw):
        general_calls.append(batch)
        return orig(x2, batch, **kw)

    monkeypatch.setattr(pcd, "encode_w2_dense_rows_flat", counting)
    rng = np.random.default_rng(3)
    signals = [rng.integers(-30000, 30000, 20_000, dtype=np.int16)
               for _ in range(5)]
    opts = CompressionOptions(True, 2, 1, 0)
    streams = multihost.compress_signals(signals, opts, plane="pallas")
    assert general_calls == [5], general_calls
    for sig, stream in zip(signals, streams):
        assert stream == api.vbz_compress_sized(sig, opts)
        out = api.vbz_decompress_sized(stream, opts)
        np.testing.assert_array_equal(np.frombuffer(out, np.int16), sig)


def test_compress_signals_pallas_compact():
    """Smooth signal rows stay on the compact batched-grid kernels (no
    overflow fallback) and still match the api streams byte-for-byte."""
    rng = np.random.default_rng(1)
    signals = [np.clip(500 + np.cumsum(rng.normal(0, 12, n)), -2000,
                       2000).astype(np.int16)
               for n in (30_000, 70_000, 16_384)]
    opts = CompressionOptions(True, 2, 1, 0)
    streams = multihost.compress_signals(signals, opts, plane="pallas")
    for sig, stream in zip(signals, streams):
        assert stream == api.vbz_compress_sized(sig, opts)


@pytest.mark.skipif(not os.path.isdir(TEST_DATA),
                    reason="reference test_data not mounted")
@pytest.mark.slow
@pytest.mark.parametrize("plane", ["auto", "pallas"])
def test_compress_corpus(tmp_path, plane):
    stats = multihost.compress_corpus(
        [os.path.join(TEST_DATA, "multi_fast5_zip.fast5")],
        out_dir=str(tmp_path), plane=plane)
    assert stats.files == 1
    assert stats.reads == 10
    assert stats.raw_bytes == 3_097_862
    # Must beat the reference's stored size (1,308,058 incl. headers).
    assert stats.compressed_bytes <= 1_308_058
    assert (tmp_path / "multi_fast5_zip.fast5.vbz").exists()


@pytest.mark.skipif(not os.path.isdir(TEST_DATA),
                    reason="reference test_data not mounted")
@pytest.mark.slow
def test_two_process_corpus(tmp_path):
    """REAL 2-process jax.distributed run: two spawned processes, each with
    its own 4-device CPU mesh, split the corpus round-robin and allgather
    global stats over the distributed backend (the DCN analog). Every
    process must report identical global totals. VBZ_PLANE=pallas drives
    the production codec5 kernels (interpret mode) end to end."""
    import json
    import shutil
    import socket
    import subprocess
    import sys

    src = os.path.join(TEST_DATA, "multi_fast5_zip.fast5")
    second = str(tmp_path / "copy.fast5")
    shutil.copyfile(src, second)
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=4",
               PYTHONPATH=repo, VBZ_PLANE="pallas")
    procs = [subprocess.Popen(
        [sys.executable, os.path.join(repo, "tools", "multihost_smoke.py"),
         f"localhost:{port}", "2", str(pid), str(tmp_path), src, second],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True)
        for pid in range(2)]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=420)
        assert p.returncode == 0, err[-2000:]
        # Gloo logs to stdout around our line; pick the JSON one.
        line = [ln for ln in out.splitlines() if ln.startswith("{")][-1]
        outs.append(json.loads(line))

    for o in outs:
        assert o["process_count"] == 2
        assert o["files"] == 2
        assert o["reads"] == 20
        assert o["raw_bytes"] == 2 * 3_097_862
        assert o["compressed_bytes"] <= 2 * 1_308_058
    assert outs[0]["compressed_bytes"] == outs[1]["compressed_bytes"]
    # Each process wrote its own share's output file.
    assert (tmp_path / "multi_fast5_zip.fast5.vbz").exists()
    assert (tmp_path / "copy.fast5.vbz").exists()
