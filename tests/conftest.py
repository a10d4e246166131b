"""Test configuration: run JAX on a virtual 8-device CPU mesh so sharding
tests exercise real multi-chip layouts without TPU hardware."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

# The axon sitecustomize force-registers the TPU platform and overwrites
# jax_platforms at interpreter start; undo it before any backend initializes
# so tests run on the virtual 8-device CPU mesh.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

REFERENCE_TEST_DATA = "/root/reference/test_data"
