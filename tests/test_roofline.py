"""Speed-of-light accounting helpers (utils/roofline.py)."""

import numpy as np
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from vbz_compression_tpu.utils import roofline


def test_traffic_factor_compact():
    # block 64K / slack 2048: 2 B input + 0.25 key + (64K + 8K)/64K staged
    # data bytes per value, over 2 input bytes.
    assert roofline.w2_traffic_factor(65536, 2048) == 1.6875


def test_traffic_factor_general():
    # slack = block: staging extension rounds 64K + 4K up to 68K... the
    # i8-tile rounding makes it 69632.
    assert roofline._ext_bytes(65536) == 69632
    assert roofline.w2_traffic_factor(65536, 65536) == 2.15625


def test_copy_blocked_roundtrip():
    x = jnp.arange(128 * 1024, dtype=jnp.int32).reshape(1024, 128)
    with pltpu.force_tpu_interpret_mode():
        out = roofline.copy_blocked(x, rows=256)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(x))
