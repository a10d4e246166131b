"""Binary plugin interop: our HDF5 filter plugin vs the REFERENCE's plugin
built from /root/reference/vbz_plugin (make -C native ref_plugin).

Both directions are proven over the cd_values option lattice:
  - our-write / ref-read: files we produce load through the reference's
    shipped filter binary (vbz_plugin/vbz_plugin.cpp:97-229).
  - ref-write / our-read: files the reference produces load through ours.

HDF5 caches the plugin path per process, so each half runs in a fresh
subprocess with its own HDF5_PLUGIN_PATH. Skips if either .so is absent
and cannot be built (no compiler / no reference mount).
"""

import os
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # builds the reference plugin binary

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUR_PLUGIN = os.path.join(REPO, "native")
REF_PLUGIN = os.path.join(REPO, "native", "refplugin")

# (version, integer_size, zigzag, zstd_level) — cd_values as our plugin and
# the reference's both persist them (vbz_plugin_user_utils.h:16-31).
LATTICE = [
    (0, 2, 1, 1),   # fast5 default
    (0, 2, 1, 0),
    (0, 2, 0, 1),
    (0, 1, 1, 1),
    (0, 4, 1, 1),
    (1, 1, 1, 1),   # v1 nibble path
    (1, 2, 1, 1),   # v1 int16 (delegates to v0)
]

WRITE_SNIPPET = """
import os, sys
import numpy as np
os.environ["HDF5_PLUGIN_PATH"] = sys.argv[1]
import h5py
path, version, isize, zigzag, level = (
    sys.argv[2], *map(int, sys.argv[3:7]))
dt = {1: np.int8, 2: np.int16, 4: np.int32}[isize]
rng = np.random.default_rng(3)
sig = np.cumsum(rng.normal(0, 9, 50000)).astype(dt)
with h5py.File(path, "w") as f:
    f.create_dataset("s", data=sig, chunks=(len(sig),), compression=32020,
                     compression_opts=(version, isize, zigzag, level))
"""

READ_SNIPPET = """
import os, sys
import numpy as np
os.environ["HDF5_PLUGIN_PATH"] = sys.argv[1]
import h5py
path, isize = sys.argv[2], int(sys.argv[3])
dt = {1: np.int8, 2: np.int16, 4: np.int32}[isize]
rng = np.random.default_rng(3)
sig = np.cumsum(rng.normal(0, 9, 50000)).astype(dt)
with h5py.File(path) as f:
    out = f["s"][...]
assert out.dtype == dt and np.array_equal(out, sig), "interop mismatch"
"""


def _plugin_available(path: str, target: str) -> bool:
    if os.path.exists(os.path.join(path, "libvbz_hdf_plugin.so")):
        return True
    r = subprocess.run(["make", "-C", os.path.join(REPO, "native"),
                        "-s", target], capture_output=True)
    return r.returncode == 0 and os.path.exists(
        os.path.join(path, "libvbz_hdf_plugin.so"))


pytestmark = pytest.mark.skipif(
    not (_plugin_available(OUR_PLUGIN, "libvbz_hdf_plugin.so")
         and _plugin_available(REF_PLUGIN, "ref_plugin")),
    reason="plugin .so not buildable in this environment")


def _run(snippet: str, *args: str):
    env = {k: v for k, v in os.environ.items() if k != "HDF5_PLUGIN_PATH"}
    r = subprocess.run([sys.executable, "-c", snippet, *args],
                       capture_output=True, text=True, env=env)
    assert r.returncode == 0, f"subprocess failed:\n{r.stderr[-2000:]}"


@pytest.mark.parametrize("opts", LATTICE)
def test_our_write_ref_read(opts, tmp_path):
    path = str(tmp_path / "ours.h5")
    _run(WRITE_SNIPPET, OUR_PLUGIN, path, *map(str, opts))
    _run(READ_SNIPPET, REF_PLUGIN, path, str(opts[1]))


@pytest.mark.parametrize("opts", LATTICE)
def test_ref_write_our_read(opts, tmp_path):
    path = str(tmp_path / "ref.h5")
    _run(WRITE_SNIPPET, REF_PLUGIN, path, *map(str, opts))
    _run(READ_SNIPPET, OUR_PLUGIN, path, str(opts[1]))
