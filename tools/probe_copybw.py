"""Measure the achievable HBM streaming bandwidth on this chip with a
Pallas copy kernel (HBM -> VMEM block -> HBM), slope-timed like bench.py.

This is the empirical roofline denominator for the speed-of-light
accounting (vbz_compression_tpu/utils/roofline.py). Findings 2026-08-21:

- 64 MiB arrays fit VMEM and read 0.9-2.4 TB/s — NOT an HBM number; use
  >= 256 MiB.
- HBM-resident: ~670-730 GB/s r+w total traffic (v5e datasheet 819),
  mostly flat in block rows (512 -> 8192 gains ~8%).

Usage: python tools/probe_copybw.py [mib]
"""

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from vbz_compression_tpu.utils import roofline  # noqa: E402

if __name__ == "__main__":
    mib = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    for rows in (512, 2048, 8192):
        gbps = roofline.measure_copy_gbps(mib, rows=rows)
        print(f"copy {mib} MiB, block ({rows},128) i32: {gbps:.1f} GB/s r+w")
