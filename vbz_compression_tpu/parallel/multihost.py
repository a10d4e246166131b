"""Multi-host corpus driver.

Scales the codec from one host to a pod slice: each process compresses its
round-robin share of fast5 files on its local devices (data-parallel mesh,
:mod:`.sharded`), and global corpus statistics are combined with a
``process_allgather`` over DCN. The reference has no distributed runtime at
all (its parallelism is ``xargs -P`` over files, reference README.md:36-40) —
this module is the TPU-native replacement.

Usage on each host of a slice:

    from vbz_compression_tpu.parallel import multihost
    multihost.initialize()            # jax.distributed under the hood
    stats = multihost.compress_corpus(list_of_fast5_paths, out_dir)
"""

from __future__ import annotations

import dataclasses
import os

import numpy as np

import jax

from .. import api
from ..options import CompressionOptions
from ..utils import hdf5_chunks
from . import sharded


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """Initialize the JAX distributed runtime (no-op for single process)."""
    if num_processes in (None, 1) and coordinator_address is None:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id)


@dataclasses.dataclass
class CorpusStats:
    files: int
    reads: int
    raw_bytes: int
    compressed_bytes: int

    @property
    def ratio(self) -> float:
        return self.compressed_bytes / max(self.raw_bytes, 1)


def _local_share(paths: list[str]) -> list[str]:
    """Round-robin file assignment by process index."""
    pid = jax.process_index()
    nproc = jax.process_count()
    return [p for i, p in enumerate(sorted(paths)) if i % nproc == pid]


def compress_signals(signals: list[np.ndarray],
                     options: CompressionOptions | None = None,
                     mesh=None, bucket: int = 1 << 17) -> list[bytes]:
    """Compress a list of int16 signals on the local device mesh and return
    sized vbz streams in input order.

    Signals are bucketed by padded length so each bucket is one batched
    device call; the zstd stage runs host-side on the gathered payloads.
    """
    options = options or CompressionOptions(True, 2, 1, 0)
    mesh = mesh or sharded.make_mesh(jax.local_devices())
    ndev = len(mesh.devices.reshape(-1))

    out: list[bytes | None] = [None] * len(signals)
    by_bucket: dict[int, list[int]] = {}
    for i, s in enumerate(signals):
        b = max(4096, 1 << (max(int(s.size) - 1, 1).bit_length()))
        by_bucket.setdefault(b, []).append(i)

    for b, idxs in by_bucket.items():
        # Pad the batch to a multiple of the device count.
        batch_idx = list(idxs)
        while len(batch_idx) % ndev:
            batch_idx.append(idxs[-1])
        batch, lens = sharded.pad_chunks(
            [signals[i].astype(np.int16) for i in batch_idx], pad_to=b)
        streams, stream_lens, _total = sharded.batch_encode_sharded(
            sharded.shard_batch(mesh, batch),
            sharded.shard_batch(mesh, lens),
            mesh=mesh, integer_size=options.integer_size,
            use_zigzag=options.perform_delta_zig_zag)
        streams_np = np.asarray(streams)
        lens_np = np.asarray(stream_lens)
        for row, i in enumerate(batch_idx[: len(idxs)]):
            svb = streams_np[row, : lens_np[row]].tobytes()
            payload = (api.zstd_compress(svb, options.zstd_compression_level)
                       if options.zstd_compression_level else svb)
            import struct
            out[i] = struct.pack("<I", signals[i].nbytes) + payload
    return [o for o in out if o is not None]


def compress_corpus(paths: list[str], out_dir: str | None = None,
                    options: CompressionOptions | None = None) -> CorpusStats:
    """Compress every signal in this process's share of ``paths``.

    Returns *global* corpus stats (allgathered across processes).
    """
    options = options or CompressionOptions(True, 2, 1, 0)
    local = _local_share(paths)
    files = reads = raw = comp = 0
    for path in local:
        signals = list(hdf5_chunks.read_gzip_signals(path).values())
        if not signals:
            continue
        streams = compress_signals(signals, options)
        files += 1
        reads += len(signals)
        raw += sum(s.nbytes for s in signals)
        comp += sum(len(c) for c in streams)
        if out_dir:
            base = os.path.basename(path) + ".vbz"
            with open(os.path.join(out_dir, base), "wb") as f:
                for c in streams:
                    f.write(np.uint32(len(c)).tobytes())
                    f.write(c)

    local_stats = np.array([files, reads, raw, comp], dtype=np.int64)
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        gathered = multihost_utils.process_allgather(local_stats)
        total = np.asarray(gathered).reshape(-1, 4).sum(axis=0)
    else:
        total = local_stats
    return CorpusStats(int(total[0]), int(total[1]), int(total[2]),
                       int(total[3]))
