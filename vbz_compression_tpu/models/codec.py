"""JAX codec backend — the host-facing wrapper around the TPU data plane.

Presents the same backend interface as the NumPy oracle
(``svb_compress`` / ``svb_decompress``) so the pipeline orchestrator
(:mod:`..api`) can run the StreamVByte stage on TPU, plus a batched API for
bulk chunk workloads.

Static-shape management: chunk lengths are padded to bucket sizes so the jit
cache stays small (SURVEY.md §7 "ragged reads" landmine). Buckets double from
4 KiB values up; one compiled executable serves each
(bucket, integer_size, zigzag) combination.

"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from ..errors import (
    VBZ_INTEGER_SIZE_ERROR,
    VBZ_STREAMVBYTE_STREAM_ERROR,
    VbzError,
)
from ..ops import jax_svb, scalar

_SIGNED_FOR_SIZE = {1: np.int8, 2: np.int16, 4: np.int32}
_MIN_BUCKET = 4096


def bucket_size(count: int) -> int:
    b = _MIN_BUCKET
    while b < count:
        b *= 2
    return b


def _pad_to(arr: np.ndarray, size: int) -> np.ndarray:
    out = np.zeros(size, dtype=arr.dtype)
    out[: arr.size] = arr
    return out


class JaxSvbBackend:
    """StreamVByte stage on the JAX/XLA data plane (drop-in for the oracle)."""

    def __init__(self, device=None):
        self.device = device

    # -- backend interface ---------------------------------------------------

    def svb_compress(self, data, integer_size: int, use_zigzag: bool,
                     version: int) -> bytes:
        if integer_size not in (1, 2, 4):
            raise VbzError(VBZ_INTEGER_SIZE_ERROR, f"integer_size={integer_size}")
        raw = np.frombuffer(bytes(data), dtype=np.uint8) if not isinstance(
            data, np.ndarray) else np.ascontiguousarray(data).view(np.uint8).ravel()
        if raw.size % integer_size != 0:
            from ..errors import VBZ_INPUT_SIZE_ERROR
            raise VbzError(VBZ_INPUT_SIZE_ERROR,
                           f"{raw.size} % {integer_size} != 0")
        typed = raw.view(_SIGNED_FOR_SIZE[integer_size])
        n = typed.size
        if n == 0:
            return b""
        N = bucket_size(n)
        x = _pad_to(typed, N)
        stream, total = jax_svb.encode_chunk(
            jnp.asarray(x), jnp.int32(n), integer_size, use_zigzag,
            version=version)
        total = int(total)
        return np.asarray(stream[:total]).tobytes()

    def svb_decompress(self, stream, count: int, integer_size: int,
                       use_zigzag: bool, version: int) -> np.ndarray:
        if integer_size not in (1, 2, 4):
            raise VbzError(VBZ_INTEGER_SIZE_ERROR, f"integer_size={integer_size}")
        buf = np.frombuffer(bytes(stream), dtype=np.uint8) if not isinstance(
            stream, np.ndarray) else stream.astype(np.uint8, copy=False)
        in_len = buf.size
        if count == 0 or in_len == 0:
            if in_len != count:
                raise VbzError(VBZ_STREAMVBYTE_STREAM_ERROR,
                               "empty stream mismatch")
            return np.zeros(0, dtype=_SIGNED_FOR_SIZE[integer_size])
        N = bucket_size(count)
        M = N // 4 + (2 * N if (version == 1 and integer_size == 1) else 4 * N)
        padded = _pad_to(buf, max(M, in_len))[:M] if in_len <= M else None
        if padded is None:
            raise VbzError(VBZ_STREAMVBYTE_STREAM_ERROR, "stream too long")
        out, ok = jax_svb.decode_chunk(
            jnp.asarray(padded), jnp.int32(count), jnp.int32(in_len),
            integer_size, use_zigzag, N, version=version)
        if not bool(ok):
            raise VbzError(VBZ_STREAMVBYTE_STREAM_ERROR, "validation failed")
        return np.asarray(out[:count])


_PALLAS_FLAVOR = {(2, True): "zz16", (2, False): "none16",
                  (1, True): "zz8", (1, False): "none8",
                  (4, True): "zz32", (4, False): "none32"}

# pallas_codec4/5 (W2): the in-kernel key pack/unpack needs the per-block
# key rows (block/512) to be a multiple of the u8 sublane tile (32), and the
# i8 data plane needs 4096-multiple DMA spans.
_PC4_MIN_BLOCK = 16384
_PC5_MAX_BLOCK = 65536  # larger W2 blocks amortize fixed cost (codec5 only;
#                         codec3's displacement bits cap W2 at 16384)
_PC5_GENERAL_BLOCK = 16384  # general kernels: d_bits=15 fits the packed
#                             word -> single-channel routing both ways
_PC4_SLACK = 2048

_TRIM_GRAIN = 8192


@functools.partial(jax.jit, static_argnums=1)
def _trim_u8_jit(d, cap):
    return d[:cap].astype(jnp.uint8)


def _trim_u8(data_x, data_len: int) -> np.ndarray:
    """Pull the first ``data_len`` expanded bytes of a device array as u8,
    slicing on-device at a BUCKETED cap so the jit cache stays small (a
    per-exact-length slice would recompile for every chunk)."""
    cap = min(int(data_x.shape[0]),
              -(-data_len // _TRIM_GRAIN) * _TRIM_GRAIN)
    return np.asarray(_trim_u8_jit(data_x, cap))[:data_len]


@functools.partial(jax.jit, static_argnums=1)
def _slice_jit(d, cap):
    return d[:cap]


def _pull_prefix(arr, n: int) -> np.ndarray:
    """Pull the first ``n`` elements of a device array (bucketed cap;
    2-D (R, 128) kernel-native outputs are sliced by rows and flattened
    host-side)."""
    if arr.ndim == 2:
        cap = -(-n // _MIN_BUCKET) * _MIN_BUCKET
        rows = min(int(arr.shape[0]), -(-cap // int(arr.shape[1])))
        return np.asarray(_slice_jit(arr, rows)).reshape(-1)[:n]
    cap = min(int(arr.shape[0]), -(-n // _MIN_BUCKET) * _MIN_BUCKET)
    return np.asarray(_slice_jit(arr, cap))[:n]


class PallasSvbBackend(JaxSvbBackend):
    """StreamVByte stage on the Pallas TPU kernels (butterfly routing in
    VMEM, :mod:`..ops.pallas_codec3`) for v0 streams on TPU hardware;
    falls back to the XLA formulation elsewhere (CPU, v1 nibble streams).

    Unsized tails are handled by *code-0 padding*: the input is padded to a
    block multiple with repeats of its last value (zig-zag delta 0 → code 0,
    matching the zeroed trailing key bits the reference writes,
    ``streamvbyte_encode``'s (count+3)/4 key layout), then the key and data
    sections are truncated to the exact (n+3)/4 and n+E(n) byte lengths.
    """

    def __init__(self, device=None):
        super().__init__(device)
        self._on_tpu = None
        self._cpu = None

    def _cpu_fallback(self):
        """Native C++ codec for paths the TPU kernels don't cover (no TPU
        present, or v1 int8 nibble streams — see ROADMAP "v1 nibble" for why
        that corner is host-side). The XLA formulation is slower than one
        CPU core, so it is only used when the native lib isn't built."""
        if self._cpu is None:
            try:
                from .. import native_backend as nb

                nb.lib()  # force the .so load now, not at first call
                self._cpu = nb.NativeSvbBackend()
            except Exception:
                self._cpu = False
        return self._cpu if self._cpu else None

    def _pallas_ok(self) -> bool:
        if self._on_tpu is None:
            try:
                self._on_tpu = jax.devices()[0].platform == "tpu"
            except Exception:  # pragma: no cover
                self._on_tpu = False
        return self._on_tpu

    @staticmethod
    def _block_for(flavor: str, N: int, integer_size: int) -> int:
        from ..ops import pallas_codec3 as pc3

        # Displacement bits bound the block: 16384 for the 2-byte kernel,
        # 8192 for the 4-byte one (see pallas_codec3 module docstring).
        max_block = 8192 if flavor in pc3.W4_FLAVORS else 16384
        b = pc3.MIN_BLOCK[flavor]
        while b * 2 <= min(N, max_block):
            b *= 2
        return b

    @staticmethod
    def _typed_input(data, integer_size: int) -> np.ndarray:
        raw = np.frombuffer(bytes(data), dtype=np.uint8) if not isinstance(
            data, np.ndarray) else np.ascontiguousarray(
                data).view(np.uint8).ravel()
        if raw.size % integer_size != 0:
            from ..errors import VBZ_INPUT_SIZE_ERROR
            raise VbzError(VBZ_INPUT_SIZE_ERROR,
                           f"{raw.size} % {integer_size} != 0")
        return raw.view(_SIGNED_FOR_SIZE[integer_size])

    def _queue_encode(self, typed: np.ndarray, integer_size: int,
                      use_zigzag: bool) -> dict:
        """Start the device encode for one chunk (async — no host pull)."""
        from ..ops import pallas_codec3 as pc3

        n = typed.size
        flavor = _PALLAS_FLAVOR[(integer_size, use_zigzag)]
        wide = flavor in pc3.W4_FLAVORS
        block = self._block_for(flavor, bucket_size(n), integer_size)
        N = max(bucket_size(n), block)
        x = np.full(N, typed[-1] if use_zigzag else 0, dtype=typed.dtype)
        x[:n] = typed
        xj = jnp.asarray(x)
        ovf = None
        if wide and N >= 16384:
            # Round-5 W4 deletion-compaction kernels: 2.2-4.4x the codec3
            # W4 plane on chip (tools ledger; zz32 enc 13.0 vs 4.1).
            from ..ops import pallas_w4 as pw4

            keys, data_x, _ = pw4.encode_w4_dense(xj, block=16384,
                                                  flavor=flavor)
        elif wide:
            keys, data_x, _ = pc3.encode_w4(xj, block=block, flavor=flavor)
        elif block >= _PC4_MIN_BLOCK:
            # v5 kernels (alignment-split routing, in-kernel MXU key pack,
            # int8 data plane) with overflow fallback to the general
            # kernel. The wire format is block-independent, so codec5 can
            # use larger blocks than the codec3 fallback's cap. The
            # rows_flat entry (B=1) feeds the kernel its NATIVE (N/128,
            # 128) layout — the host reshape is a free view, while the
            # 1-D device input cost an XLA relayout (~52 vs ~70 GB/s
            # within one window; see ROADMAP round-4 ledger).
            from ..ops import pallas_codec5 as pc5

            block5 = min(_PC5_MAX_BLOCK, N)
            x2 = jnp.asarray(x.reshape(N // 128, 128))
            xj = x2  # the general fallback re-encodes from this
            keys, data_x, _lens, ovf1 = pc5.encode_w2_rows_flat(
                x2, 1, block=block5, flavor=flavor, slack=_PC4_SLACK)
            ovf = ovf1[0]
        else:
            keys, data_x, _ = pc3.encode_w2(xj, block=block, flavor=flavor)
        return dict(keys=keys, data=data_x, ovf=ovf, xj=xj, n=n,
                    block=block, flavor=flavor, wide=wide)

    def _finish_encode(self, rec: dict, ovf: "int | None" = None) -> bytes:
        """Pull one queued encode's results and assemble the svb stream.

        ``ovf`` lets batch callers supply the already-pulled overflow flag
        so the per-chunk scalar device sync is avoided (one stacked pull
        for the whole batch instead of one RPC per chunk).
        """
        keys, data_x = rec["keys"], rec["data"]
        if ovf is None:
            ovf = 0 if rec["ovf"] is None else int(rec["ovf"])
        if ovf:
            N = int(np.prod(rec["xj"].shape))
            if rec["flavor"] == "zz16" and N >= _PC5_MAX_BLOCK:
                # Dense-regime leftward network (round 5): depth
                # log2(c0_sum) at block 65536 — on-chip A/B vs the
                # general kernel on incompressible content: enc +47%,
                # dec +32% (tools/ab_dense.py). Wire format identical.
                from ..ops import pallas_dense as pcd

                keys, data_x, _ = pcd.encode_w2_dense(
                    rec["xj"].reshape(-1), block=_PC5_MAX_BLOCK)
            else:
                from ..ops import pallas_codec5 as pc5

                # Block 16384: the general kernel's displacements then
                # fit the packed word (single-channel routing). Wire
                # format is block-agnostic.
                block_g = min(_PC5_GENERAL_BLOCK, N)
                keys, data_x, _ = pc5.encode_w2_general(
                    rec["xj"].reshape(-1), block=block_g,
                    flavor=rec["flavor"])
        n = rec["n"]
        key_len = (n + 3) // 4
        # reshape(-1): the rows_flat kernel returns keys as (N/512, 128).
        keys_np = np.asarray(keys).reshape(-1)
        codes = (np.repeat(keys_np[:key_len], 4) >> np.tile(
            np.array([0, 2, 4, 6], np.uint8), key_len)) & 3
        if rec["wide"]:
            lens = codes[:n].astype(np.int64) + 1
        else:
            lens = np.minimum(codes[:n], 1).astype(np.int64) + 1
        data_len = int(lens.sum())
        dense = _trim_u8(data_x, data_len)
        return keys_np[:key_len].tobytes() + dense.tobytes()

    # v1 half-byte device kernels need at least one 16384-value block;
    # smaller chunks take the CPU/oracle path (the jit-cache bucketing
    # would pad tiny chunks 100x otherwise).
    _V1_BLOCK = 16384

    def _v1_compress(self, typed: np.ndarray, use_zigzag: bool) -> bytes:
        from ..ops import pallas_v1 as pv1

        n = typed.size
        N = -(-n // self._V1_BLOCK) * self._V1_BLOCK
        # Pads encode as code 0 (zigzag: repeat the last sample -> delta
        # 0; identity: value 0), contributing no nibbles or key bits.
        fill = typed[-1] if use_zigzag else 0
        x = np.full(N, fill, dtype=np.int8)
        x[:n] = typed
        keys, data, total = pv1.encode_v1(
            jnp.asarray(x), block=self._V1_BLOCK,
            flavor="zz8" if use_zigzag else "none8")
        tn = int(total[None][0])
        key_len = (n + 3) // 4
        keys_np = np.asarray(keys)
        data_np = np.asarray(data).astype(np.uint8)
        return keys_np[:key_len].tobytes() + \
            data_np[: (tn + 1) // 2].tobytes()

    def _v1_decompress(self, buf: np.ndarray, count: int,
                       use_zigzag: bool) -> np.ndarray:
        from ..ops import pallas_v1 as pv1

        key_len = (count + 3) // 4
        if buf.size < key_len:
            raise VbzError(VBZ_STREAMVBYTE_STREAM_ERROR, "stream too short")
        keys = buf[:key_len]
        codes = (np.repeat(keys, 4) >> np.tile(
            np.array([0, 2, 4, 6], np.uint8), key_len)) & 3
        if (codes[count:] != 0).any():
            raise VbzError(VBZ_STREAMVBYTE_STREAM_ERROR,
                           "nonzero trailing key bits")
        ncounts = (np.int64(1) << codes[:count].astype(np.int64)) >> 1
        total_nib = int(ncounts.sum())
        # streamvbyte_validate_stream_half semantics (v1/impl.h:183-216).
        if key_len + (total_nib + 1) // 2 != buf.size:
            raise VbzError(VBZ_STREAMVBYTE_STREAM_ERROR,
                           "stream length mismatch")
        N = -(-count // self._V1_BLOCK) * self._V1_BLOCK
        keys_pad = np.zeros(N // 4, np.uint8)
        keys_pad[:key_len] = keys
        kj = jnp.asarray(keys_pad)
        noffs = pv1.nib_offsets_from_keys(kj, self._V1_BLOCK)
        out = pv1.decode_v1(
            kj, jnp.asarray(buf[key_len:].astype(np.int8)), noffs,
            block=self._V1_BLOCK,
            flavor="zz8" if use_zigzag else "none8")
        return np.asarray(out)[:count]

    def svb_compress(self, data, integer_size: int, use_zigzag: bool,
                     version: int) -> bytes:
        v1_int8 = version == 1 and integer_size == 1
        if v1_int8 and self._pallas_ok():
            # Round-5 v1 nibble device kernels (deletion-compaction
            # network, pallas_v1) — large chunks only.
            typed = self._typed_input(data, 1)
            if typed.size >= self._V1_BLOCK:
                return self._v1_compress(typed, use_zigzag)
        if not self._pallas_ok() or v1_int8:
            cpu = self._cpu_fallback()
            if cpu is not None:
                return cpu.svb_compress(data, integer_size, use_zigzag,
                                        version)
            return super().svb_compress(data, integer_size, use_zigzag,
                                        version)
        typed = self._typed_input(data, integer_size)
        if typed.size == 0:
            return b""
        return self._finish_encode(
            self._queue_encode(typed, integer_size, use_zigzag))

    def svb_compress_batch(self, arrays, integer_size: int, use_zigzag: bool,
                           version: int) -> list:
        """Bulk encode: queue every chunk's device calls before pulling any
        result, so the device pipeline overlaps compute with host pulls
        (BASELINE config: "bulk multi-read batch ... on one host")."""
        if not self._pallas_ok() or (version == 1 and integer_size == 1):
            return [self.svb_compress(a, integer_size, use_zigzag, version)
                    for a in arrays]  # svb_compress resolves the CPU path
        recs = []
        for data in arrays:
            typed = self._typed_input(data, integer_size)
            recs.append(None if typed.size == 0 else
                        self._queue_encode(typed, integer_size, use_zigzag))
        # Pull every chunk's overflow flag in ONE device transfer instead of
        # one scalar RPC per chunk (each sync costs a tunnel round trip).
        flagged = [r for r in recs if r is not None and r["ovf"] is not None]
        if flagged:
            pulled = np.asarray(jnp.stack([r["ovf"] for r in flagged]))
            for r, v in zip(flagged, pulled):
                r["_ovf_host"] = int(v)
        return [b"" if r is None else
                self._finish_encode(r, ovf=r.get("_ovf_host"))
                for r in recs]

    def _queue_decode(self, buf: np.ndarray, count: int, integer_size: int,
                      use_zigzag: bool):
        """Validate the stream host-side and start the device decode
        (async — no host pull). ``buf``/``count`` must be non-empty."""
        from ..ops import pallas_codec3 as pc3

        in_len = buf.size
        key_len = (count + 3) // 4
        if in_len < key_len:
            raise VbzError(VBZ_STREAMVBYTE_STREAM_ERROR, "stream too short")
        keys = buf[:key_len]
        codes = (np.repeat(keys, 4) >> np.tile(
            np.array([0, 2, 4, 6], np.uint8), key_len)) & 3
        flavor = _PALLAS_FLAVOR[(integer_size, use_zigzag)]
        from ..ops import pallas_codec3 as _pc3
        wide = flavor in _pc3.W4_FLAVORS
        if wide:
            lens = codes[:count].astype(np.int64) + 1
        else:
            if (codes[:count] > 1).any():
                raise VbzError(VBZ_STREAMVBYTE_STREAM_ERROR,
                               "invalid code for width")
            lens = np.minimum(codes[:count], 1).astype(np.int64) + 1
        if (codes[count:] != 0).any():
            raise VbzError(VBZ_STREAMVBYTE_STREAM_ERROR,
                           "nonzero trailing key bits")
        # streamvbyte_validate_stream semantics (v0/impl.h:49-51).
        if key_len + int(lens.sum()) != in_len:
            raise VbzError(VBZ_STREAMVBYTE_STREAM_ERROR,
                           "stream length mismatch")
        block = self._block_for(flavor, bucket_size(count), integer_size)
        N = max(bucket_size(count), block)
        keys_pad = np.zeros(N // 4, np.uint8)
        keys_pad[:key_len] = keys
        # Pad codes are 0 → each pad value reads 1 byte past the real data;
        # supply zeros there (the kernel pads the expanded buffer itself).
        data_np = buf[key_len:].astype(np.int32)
        if wide and N >= 16384:
            from ..ops import pallas_w4 as pw4

            kj = jnp.asarray(keys_pad)
            out = pw4.decode_w4_dense(
                kj, jnp.asarray(buf[key_len:].astype(np.int8)),
                pw4.byte_offsets_from_keys_w4(kj, 16384),
                block=16384, flavor=flavor)
        elif wide:
            boffs = _pc3.block_offsets_from_keys(
                jnp.asarray(keys_pad), block, four_byte_codes=True)
            out = _pc3.decode_w4(jnp.asarray(keys_pad), jnp.asarray(data_np),
                                 boffs, block=block, flavor=flavor)
        else:
            # v4 compact decode needs every block's data section to fit
            # block + slack bytes (checked host-side from the codes).
            extra_pad = np.zeros(N, np.int64)
            extra_pad[:count] = lens - 1
            block5 = min(_PC5_MAX_BLOCK, N)
            if block5 >= _PC4_MIN_BLOCK:
                from ..ops import pallas_codec5 as pc5

                extra5 = extra_pad.reshape(-1, block5).sum(axis=1)
                if extra5.max() <= _PC4_SLACK:
                    # rows_flat (B=1): kernel-native layouts in and out —
                    # the 1-D device arrays cost XLA relayouts (ROADMAP
                    # round-4 ledger). Host-side padding to the batched
                    # stride is a cheap copy.
                    stride = pc5.row_stride(N, block5, _PC4_SLACK)
                    dpad = np.zeros(stride, np.int8)
                    dpad[:data_np.size] = data_np.astype(np.int8)
                    k2 = jnp.asarray(keys_pad.reshape(N // 512, 128))
                    out = pc5.decode_w2_rows_flat(
                        k2, jnp.asarray(dpad), 1, block=block5,
                        flavor=flavor, slack=_PC4_SLACK)
                elif flavor == "zz16" and N >= _PC5_MAX_BLOCK:
                    # Dense-regime leftward network (see _finish_encode).
                    from ..ops import pallas_dense as pcd

                    kj = jnp.asarray(keys_pad)
                    dj = jnp.asarray(data_np.astype(np.int8))
                    out = pcd.decode_w2_dense(
                        kj, dj,
                        pc5.block_offsets_from_keys_flat(
                            kj, _PC5_MAX_BLOCK),
                        block=_PC5_MAX_BLOCK)
                else:
                    bg = min(_PC5_GENERAL_BLOCK, N)
                    kj = jnp.asarray(keys_pad)
                    dj = jnp.asarray(data_np.astype(np.int8))
                    out = pc5.decode_w2_general(
                        kj, dj,
                        pc5.block_offsets_from_keys_flat(kj, bg),
                        block=bg, flavor=flavor)
            else:
                boffs = _pc3.block_offsets_from_keys(
                    jnp.asarray(keys_pad), block)
                out = _pc3.decode_w2(jnp.asarray(keys_pad),
                                     jnp.asarray(data_np),
                                     boffs, block=block, flavor=flavor)
        return out

    @staticmethod
    def _check_nonempty(buf: np.ndarray, count: int):
        if count == 0 or buf.size == 0:
            if buf.size != count:
                raise VbzError(VBZ_STREAMVBYTE_STREAM_ERROR,
                               "empty stream mismatch")
            return True
        return False

    @staticmethod
    def _as_u8(stream) -> np.ndarray:
        return np.frombuffer(bytes(stream), dtype=np.uint8) if not isinstance(
            stream, np.ndarray) else stream.astype(np.uint8, copy=False)

    def svb_decompress(self, stream, count: int, integer_size: int,
                       use_zigzag: bool, version: int) -> np.ndarray:
        v1_int8 = version == 1 and integer_size == 1
        if v1_int8 and self._pallas_ok() and count >= self._V1_BLOCK:
            return self._v1_decompress(self._as_u8(stream), count,
                                       use_zigzag)
        if not self._pallas_ok() or v1_int8:
            cpu = self._cpu_fallback()
            if cpu is not None:
                return cpu.svb_decompress(stream, count, integer_size,
                                          use_zigzag, version)
            return super().svb_decompress(stream, count, integer_size,
                                          use_zigzag, version)
        buf = self._as_u8(stream)
        if self._check_nonempty(buf, count):
            return np.zeros(0, dtype=_SIGNED_FOR_SIZE[integer_size])
        out = self._queue_decode(buf, count, integer_size, use_zigzag)
        return _pull_prefix(out, count)

    def svb_decompress_batch(self, streams, counts, integer_size: int,
                             use_zigzag: bool, version: int) -> list:
        """Bulk decode: queue every chunk's device decode before pulling any
        result (mirror of :meth:`svb_compress_batch`)."""
        if not self._pallas_ok() or (version == 1 and integer_size == 1):
            return [self.svb_decompress(s, c, integer_size, use_zigzag,
                                        version)  # resolves the CPU path
                    for s, c in zip(streams, counts)]
        outs = []
        for stream, count in zip(streams, counts):
            buf = self._as_u8(stream)
            if self._check_nonempty(buf, count):
                outs.append(None)
            else:
                outs.append(self._queue_decode(buf, count, integer_size,
                                               use_zigzag))
        return [np.zeros(0, dtype=_SIGNED_FOR_SIZE[integer_size])
                if o is None else _pull_prefix(o, c)
                for o, c in zip(outs, counts)]


jax_backend = JaxSvbBackend()
pallas_backend = PallasSvbBackend()
