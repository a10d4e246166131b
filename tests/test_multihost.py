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


@pytest.mark.skipif(not os.path.isdir(TEST_DATA),
                    reason="reference test_data not mounted")
def test_two_process_corpus(tmp_path):
    """REAL 2-process jax.distributed run: two spawned processes, each with
    its own 4-device CPU mesh, split the corpus round-robin and allgather
    global stats over the distributed backend (the DCN analog). Every
    process must report identical global totals."""
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
               PYTHONPATH=repo)
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
