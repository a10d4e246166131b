"""Pallas codec kernel tests (interpret mode — validates semantics; the
on-chip bit-exactness is exercised by bench.py on real hardware)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vbz_compression_tpu.ops import scalar
from vbz_compression_tpu.ops import pallas_codec2 as pc2
from vbz_compression_tpu.ops import pallas_codec3 as pc3


def _roundtrip(sig: np.ndarray, block: int):
    N = sig.size
    zz = scalar.zigzag_delta_encode(sig, 2)
    ref = scalar.svb_compress(sig, 2, True, 0)
    with pltpu.force_tpu_interpret_mode():
        keys, data, total = pc2.encode_int16_zz(jnp.asarray(zz), block=block)
    stream = np.asarray(keys).tobytes() + \
        np.asarray(data).tobytes()[: int(total)]
    assert stream == ref, "encode not bit-exact"

    keysA = np.frombuffer(ref[: N // 4], np.uint8)
    datab = np.frombuffer(ref[N // 4:], np.uint8)
    codes = (np.repeat(keysA, 4)
             >> np.tile(np.array([0, 2, 4, 6], np.uint8), keysA.size)) & 3
    bsum = (np.minimum(codes, 1) + 1).reshape(-1, block).sum(1)
    boffs = np.concatenate([[0], np.cumsum(bsum)[:-1]]).astype(np.int32)
    with pltpu.force_tpu_interpret_mode():
        out = pc2.decode_int16_zz(
            jnp.asarray(keysA), jnp.asarray(datab.astype(np.int32)),
            jnp.asarray(boffs), block=block)
    np.testing.assert_array_equal(np.asarray(out), sig)


@pytest.mark.parametrize("block", [512, 2048])
def test_pallas_roundtrip_signal(block):
    rng = np.random.default_rng(0)
    sig = np.clip(500 + np.cumsum(rng.normal(0, 12, 4096)),
                  -2000, 2000).astype(np.int16)
    _roundtrip(sig, block)


def test_pallas_roundtrip_extremes():
    # Saturating alternation exercises the 16-bit wrap and all-2-byte codes.
    sig = np.tile(np.array([-32768, 32767], np.int16), 2048)
    _roundtrip(sig, 2048)


def test_pallas_roundtrip_constant():
    # All-zero deltas: every code 0, one byte per value.
    sig = np.full(4096, 123, np.int16)
    _roundtrip(sig, 2048)


def _roundtrip3(sig: np.ndarray, block: int):
    """v3 kernels: fused delta+zigzag encode + single-channel decode,
    bit-exact vs the oracle (on-chip exactness re-checked by bench.py)."""
    N = sig.size
    ref = scalar.svb_compress(sig, 2, True, 0)
    with pltpu.force_tpu_interpret_mode():
        keys, data, total = pc3.encode_int16(jnp.asarray(sig), block=block)
    stream = np.asarray(keys).tobytes() + \
        np.asarray(data).astype(np.uint8).tobytes()[: int(total)]
    assert stream == ref, "v3 encode not bit-exact"

    keysA = np.frombuffer(ref[: N // 4], np.uint8)
    datab = np.frombuffer(ref[N // 4:], np.uint8)
    boffs = pc3.block_offsets_from_keys(jnp.asarray(keysA), block)
    with pltpu.force_tpu_interpret_mode():
        out = pc3.decode_int16(
            jnp.asarray(keysA), jnp.asarray(datab.astype(np.int32)),
            boffs, block=block)
    np.testing.assert_array_equal(np.asarray(out), sig)


def test_pallas3_roundtrip_signal():
    rng = np.random.default_rng(0)
    sig = np.clip(500 + np.cumsum(rng.normal(0, 12, 1024)),
                  -2000, 2000).astype(np.int16)
    _roundtrip3(sig, 512)


def test_pallas3_roundtrip_extremes():
    sig = np.tile(np.array([-32768, 32767], np.int16), 512)
    _roundtrip3(sig, 512)


def _roundtrip3_flavor(sig: np.ndarray, block: int, flavor: str,
                       integer_size: int, use_zigzag: bool):
    """Width-generalized v3 kernels vs the oracle (full on-chip sweep runs
    in the driver; these interpret cases pin the per-flavor semantics)."""
    N = sig.size
    ref = scalar.svb_compress(sig, integer_size, use_zigzag, 0)
    wide = flavor in pc3.W4_FLAVORS
    enc = pc3.encode_w4 if wide else pc3.encode_w2
    dec = pc3.decode_w4 if wide else pc3.decode_w2
    with pltpu.force_tpu_interpret_mode():
        keys, data, total = enc(jnp.asarray(sig), block=block, flavor=flavor)
    stream = np.asarray(keys).tobytes() + \
        np.asarray(data).astype(np.uint8).tobytes()[: int(total)]
    assert stream == ref, f"{flavor} encode not bit-exact"
    keysA = np.frombuffer(ref[: N // 4], np.uint8)
    boffs = pc3.block_offsets_from_keys(jnp.asarray(keysA), block,
                                        four_byte_codes=wide)
    datab = np.frombuffer(ref[N // 4:], np.uint8)
    with pltpu.force_tpu_interpret_mode():
        out = dec(jnp.asarray(keysA), jnp.asarray(datab.astype(np.int32)),
                  boffs, block=block, flavor=flavor)
    np.testing.assert_array_equal(np.asarray(out), sig)


def test_pallas3_zz8():
    rng = np.random.default_rng(1)
    sig = np.clip(np.cumsum(rng.normal(0, 3, 1024)), -100, 100).astype(np.int8)
    _roundtrip3_flavor(sig, 512, "zz8", 1, True)


def test_pallas3_zz32():
    rng = np.random.default_rng(2)
    sig = np.clip(5e4 + np.cumsum(rng.normal(0, 3e3, 1024)),
                  -8e6, 8e6).astype(np.int32)
    _roundtrip3_flavor(sig, 512, "zz32", 4, True)


def test_pallas3_none16_sign_extends():
    # No-zigzag widens by SIGN-EXTENSION: negative int16 → 4-byte codes.
    rng = np.random.default_rng(3)
    sig = rng.integers(-32768, 32768, 1024).astype(np.int16)
    _roundtrip3_flavor(sig, 512, "none16", 2, False)


def test_pallas3_batch_rows_independent():
    """Batched grid (B, nblocks): per-row state reset + per-row output
    regions must reproduce the single-row streams exactly."""
    rng = np.random.default_rng(4)
    B, N, block = 2, 1024, 512
    rows = [np.clip(500 + np.cumsum(rng.normal(0, 12, N)),
                    -2000, 2000).astype(np.int16) for _ in range(B)]
    xb = np.stack(rows)
    with pltpu.force_tpu_interpret_mode():
        keys, data, lens = pc3.encode_w2_batch(jnp.asarray(xb), block=block)
    keys_np, data_np = np.asarray(keys), np.asarray(data)
    for i, row in enumerate(rows):
        ref = scalar.svb_compress(row, 2, True, 0)
        stream = keys_np[i].tobytes() + \
            data_np[i].astype(np.uint8).tobytes()[: int(lens[i])]
        assert stream == ref, f"batch row {i} not bit-exact"
    boffs = pc3.block_offsets_from_keys_batch(keys, block)
    with pltpu.force_tpu_interpret_mode():
        out = pc3.decode_w2_batch(keys, data, boffs, block=block)
    np.testing.assert_array_equal(np.asarray(out), xb)


def test_pallas3_compact_roundtrip_and_overflow():
    """Compact (slack-bounded) kernel variant: bit-exact on smooth signal,
    overflow flag raised when a block exceeds the extra-bytes budget."""
    rng = np.random.default_rng(5)
    N, block, slack = 2048, 1024, 128
    sig = (100 + np.cumsum(rng.integers(-3, 4, N))).astype(np.int16)
    ref = scalar.svb_compress(sig, 2, True, 0)
    with pltpu.force_tpu_interpret_mode():
        keys, data, total, ov = pc3.encode_w2(
            jnp.asarray(sig), block=block, flavor="zz16", slack=slack)
    assert int(ov) == 0
    stream = np.asarray(keys).tobytes() + \
        np.asarray(data).astype(np.uint8).tobytes()[: int(total)]
    assert stream == ref, "compact encode not bit-exact"
    keysA = np.frombuffer(ref[: N // 4], np.uint8)
    boffs = pc3.block_offsets_from_keys(jnp.asarray(keysA), block)
    with pltpu.force_tpu_interpret_mode():
        out = pc3.decode_w2(
            jnp.asarray(keysA),
            jnp.asarray(np.frombuffer(ref[N // 4:], np.uint8).astype(np.int32)),
            boffs, block=block, flavor="zz16", slack=slack)
    np.testing.assert_array_equal(np.asarray(out), sig)

    # Random data blows the budget: flag must trip.
    bad = rng.integers(-32768, 32768, N).astype(np.int16)
    with pltpu.force_tpu_interpret_mode():
        _, _, _, ov2 = pc3.encode_w2(
            jnp.asarray(bad), block=block, flavor="zz16", slack=slack)
    assert int(ov2) == 1


def test_route_msb_collision_free():
    """Numeric validation of the monotone MSB-first routing theorem."""
    rng = np.random.default_rng(1)
    for _ in range(50):
        V = int(rng.integers(2, 200))
        lens = rng.integers(1, 3, V)
        off = np.concatenate([[0], np.cumsum(lens)[:-1]])
        d = off - np.arange(V)
        x = np.zeros(2 * V, np.int64)
        x[:V] = (d.astype(np.int64) << 20) | (np.arange(V) + 1)
        stages = max(int(d.max()).bit_length(), 1)
        for j in range(stages - 1, -1, -1):
            rolled = np.concatenate([np.zeros(1 << j, np.int64),
                                     x[: -(1 << j)]])
            bit_r = (rolled >> (20 + j)) & 1
            bit_s = (x >> (20 + j)) & 1
            new = np.where(bit_r == 1, rolled, np.where(bit_s == 0, x, 0))
            assert (x != 0).sum() == (new != 0).sum(), "collision"
            x = new
        pay = x & ((1 << 20) - 1)
        for i in range(V):
            assert pay[off[i]] == i + 1


def test_pallas3_lanes16_roundtrip():
    """i16-lane routing variant (meta+payload i16 channels): bit-exact vs
    the scalar oracle and vs the i32-channel kernels, encode and decode."""
    rng = np.random.default_rng(7)
    N, block, slack = 4096, 1024, 256
    sig = (100 + np.cumsum(rng.integers(-40, 41, N))).astype(np.int16)
    ref = scalar.svb_compress(sig, 2, True, 0)
    with pltpu.force_tpu_interpret_mode():
        keys, data, total, ov = pc3.encode_w2(
            jnp.asarray(sig), block=block, flavor="zz16", slack=slack,
            lanes16=True)
    assert int(ov) == 0
    stream = np.asarray(keys).tobytes() + \
        np.asarray(data).astype(np.uint8).tobytes()[: int(total)]
    assert stream == ref, "lanes16 encode not bit-exact"
    keysA = np.frombuffer(ref[: N // 4], np.uint8)
    boffs = pc3.block_offsets_from_keys(jnp.asarray(keysA), block)
    with pltpu.force_tpu_interpret_mode():
        out = pc3.decode_w2(
            jnp.asarray(keysA),
            jnp.asarray(np.frombuffer(ref[N // 4:], np.uint8).astype(np.int32)),
            boffs, block=block, flavor="zz16", slack=slack, lanes16=True)
    np.testing.assert_array_equal(np.asarray(out), sig)


# ---------------------------------------------------------------------------
# v4 kernels (alignment-split routing)
# ---------------------------------------------------------------------------

from vbz_compression_tpu.ops import pallas_codec4 as pc4  # noqa: E402


def test_pallas4_dyn_shift_helpers():
    """Flat dynamic shifts match numpy for awkward amounts (incl. 0)."""
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    R = 16
    x = np.arange(R * 128, dtype=np.int32).reshape(R, 128)
    for amt in (0, 1, 127, 128, 129, 1000, 1023):
        def kr(x_ref, a_ref, o_ref):
            o_ref[:] = pc4._flat_dyn_shift_right(x_ref[:], a_ref[0])

        def kl(x_ref, a_ref, o_ref):
            o_ref[:] = pc4._flat_dyn_shift_left(x_ref[:], a_ref[0])

        a = jnp.asarray(np.array([amt], np.int32))
        with pltpu.force_tpu_interpret_mode():
            r = pl.pallas_call(
                kr, out_shape=jax.ShapeDtypeStruct((R, 128), jnp.int32),
            )(jnp.asarray(x), a)
            l = pl.pallas_call(
                kl, out_shape=jax.ShapeDtypeStruct((R, 128), jnp.int32),
            )(jnp.asarray(x), a)
        flat = x.reshape(-1)
        exp_r = np.concatenate([np.zeros(amt, np.int32),
                                flat[:flat.size - amt]]).reshape(R, 128)
        exp_l = np.concatenate([flat[amt:],
                                np.zeros(amt, np.int32)]).reshape(R, 128)
        np.testing.assert_array_equal(np.asarray(r), exp_r, err_msg=f"r {amt}")
        np.testing.assert_array_equal(np.asarray(l), exp_l, err_msg=f"l {amt}")


def _roundtrip4(sig: np.ndarray, block: int, slack: int, flavor: str = "zz16",
                integer_size: int = 2, expect_overflow: bool = False,
                mod=None):
    mod = mod or pc4
    N = sig.size
    ref = scalar.svb_compress(sig, integer_size, True, 0)
    with pltpu.force_tpu_interpret_mode():
        keys, data, total, ovf = mod.encode_w2(
            jnp.asarray(sig), block=block, flavor=flavor, slack=slack)
    assert bool(int(ovf) != 0) == expect_overflow
    if expect_overflow:
        return
    stream = np.asarray(keys).tobytes() + \
        np.asarray(data).astype(np.uint8).tobytes()[: int(total)]
    assert stream == ref, "encode not bit-exact"

    keysA = np.frombuffer(ref[: N // 4], np.uint8)
    datab = np.frombuffer(ref[N // 4:], np.uint8)
    boffs = pc4.block_offsets_from_keys(jnp.asarray(keysA), block)
    with pltpu.force_tpu_interpret_mode():
        out = mod.decode_w2(
            jnp.asarray(keysA), jnp.asarray(datab.astype(np.int32)),
            boffs, block=block, flavor=flavor, slack=slack)
    np.testing.assert_array_equal(np.asarray(out), sig)


def test_pallas4_roundtrip_signal():
    rng = np.random.default_rng(0)
    sig = np.clip(500 + np.cumsum(rng.normal(0, 12, 4096)),
                  -2000, 2000).astype(np.int16)
    _roundtrip4(sig, 512, 256)


def test_pallas4_roundtrip_mixed_codes():
    # Large steps force 2-byte codes scattered through the stream so the
    # alignment-split routing actually routes (dmax > 0 across blocks).
    rng = np.random.default_rng(7)
    sig = np.cumsum(rng.integers(-400, 400, 4096)).astype(np.int16)
    _roundtrip4(sig, 512, 512)


def test_pallas4_roundtrip_constant():
    sig = np.full(2048, 123, np.int16)
    _roundtrip4(sig, 512, 128)


def test_pallas4_overflow_flag():
    # Constant +200 steps: every zigzag delta is 400 -> 2 bytes per value,
    # e_last = block, overflowing any slack < block.
    sig = (np.arange(2048, dtype=np.int32) * 200).astype(np.int16)
    _roundtrip4(sig, 512, 128, expect_overflow=True)


def test_pallas4_roundtrip_wrap_extremes():
    # Saturating alternation exercises the 16-bit wrap (deltas are +/-1
    # mod 2^16 -> all code 0).
    sig = np.tile(np.array([-32768, 32767], np.int16), 1024)
    _roundtrip4(sig, 512, 128)


def test_pallas4_zz8():
    rng = np.random.default_rng(1)
    sig = np.clip(np.cumsum(rng.normal(0, 3, 2048)),
                  -100, 100).astype(np.int8)
    _roundtrip4(sig, 512, 256, flavor="zz8", integer_size=1)


# ---------------------------------------------------------------------------
# v5 kernels (int8 data plane)
# ---------------------------------------------------------------------------

from vbz_compression_tpu.ops import pallas_codec5 as pc5  # noqa: E402


def test_pallas5_roundtrip_signal():
    rng = np.random.default_rng(0)
    sig = np.clip(500 + np.cumsum(rng.normal(0, 12, 4096)),
                  -2000, 2000).astype(np.int16)
    _roundtrip4(sig, 512, 256, mod=pc5)


def test_pallas5_roundtrip_mixed_codes():
    rng = np.random.default_rng(7)
    sig = np.cumsum(rng.integers(-400, 400, 4096)).astype(np.int16)
    _roundtrip4(sig, 512, 512, mod=pc5)


def _sparse_workload(n: int = 4096, spikes_every: int = 128) -> np.ndarray:
    """Smooth walk with a large delta every ``spikes_every`` values: each
    512-value block carries ~4 two-byte deltas (e_sum in the sparse-replay
    regime, like the realistic fast5 read-boundary workload)."""
    rng = np.random.default_rng(3)
    sig = np.clip(500 + np.cumsum(rng.normal(0, 12, n)), -2000,
                  2000).astype(np.int16)
    sig[spikes_every // 2::spikes_every] += 900
    return sig


def test_pallas5_sparse_replay_roundtrip():
    # e_sum ~ 4 per 512 block <= SPARSE_REPLAY_MAX -> the per-level select
    # path decodes (the dispatch cond picks it inside the kernel).
    _roundtrip4(_sparse_workload(), 512, 256, mod=pc5)


def test_pallas5_sparse_vs_dense_replay():
    """The sparse per-level select and the dense push/pull ladder must
    decode identical streams identically (sparse_max=0 forces dense)."""
    sig = _sparse_workload()
    N = sig.size
    ref = scalar.svb_compress(sig, 2, True, 0)
    keysA = np.frombuffer(ref[: N // 4], np.uint8)
    datab = np.frombuffer(ref[N // 4:], np.uint8)
    boffs = pc4.block_offsets_from_keys(jnp.asarray(keysA), 512)
    outs = {}
    for sparse_max in (-2, -1, 0, 10, 64):
        with pltpu.force_tpu_interpret_mode():
            out = pc5.decode_w2(
                jnp.asarray(keysA), jnp.asarray(datab.astype(np.int32)),
                boffs, block=512, flavor="zz16", slack=256,
                sparse_max=sparse_max)
        outs[sparse_max] = np.asarray(out)
        np.testing.assert_array_equal(outs[sparse_max], sig)


def test_pallas5_sparse_replay_boundary():
    # e_sum exactly at / just past the sparse bound exercises the
    # dispatch cond on both sides within one stream.
    rng = np.random.default_rng(5)
    sig = np.clip(500 + np.cumsum(rng.normal(0, 12, 2048)), -2000,
                  2000).astype(np.int16)
    sig[10:523:51] += 700        # block 0: 11 spikes (> sparse_max 10)
    sig[512 + 37::400] += 700    # later blocks: sparse
    _roundtrip4(sig, 512, 256, mod=pc5)


def test_pallas5_overflow_flag():
    sig = (np.arange(2048, dtype=np.int32) * 200).astype(np.int16)
    _roundtrip4(sig, 512, 128, expect_overflow=True, mod=pc5)


def test_pallas5_zz8():
    rng = np.random.default_rng(1)
    sig = np.clip(np.cumsum(rng.normal(0, 3, 2048)),
                  -100, 100).astype(np.int8)
    _roundtrip4(sig, 512, 256, flavor="zz8", integer_size=1, mod=pc5)


def _roundtrip5_general(sig: np.ndarray, block: int):
    N = sig.size
    ref = scalar.svb_compress(sig, 2, True, 0)
    with pltpu.force_tpu_interpret_mode():
        keys, data, total = pc5.encode_w2_general(
            jnp.asarray(sig), block=block)
    stream = np.asarray(keys).tobytes() + \
        np.asarray(data).astype(np.uint8).tobytes()[: int(total)]
    assert stream == ref, "v5-general encode not bit-exact"
    keysA = np.frombuffer(ref[: N // 4], np.uint8)
    datab = np.frombuffer(ref[N // 4:], np.uint8)
    boffs = pc4.block_offsets_from_keys(jnp.asarray(keysA), block)
    with pltpu.force_tpu_interpret_mode():
        out = pc5.decode_w2_general(
            jnp.asarray(keysA), jnp.asarray(datab.astype(np.int32)),
            boffs, block=block)
    np.testing.assert_array_equal(np.asarray(out), sig)


def test_pallas5_general_incompressible():
    # Every value takes 2 bytes: the compact slack budget can't hold it;
    # the general split-meta variant must (no overflow concept).
    rng = np.random.default_rng(9)
    sig = rng.integers(-32768, 32768, 4096).astype(np.int16)
    _roundtrip5_general(sig, 512)


def test_pallas5_general_signal():
    rng = np.random.default_rng(0)
    sig = np.clip(500 + np.cumsum(rng.normal(0, 12, 4096)),
                  -2000, 2000).astype(np.int16)
    _roundtrip5_general(sig, 1024)


def test_pallas5_cross_row_psum_two_level():
    """The 2-level cross-row prefix sum (transpose + tiny-array scan) must
    match a plain cumsum at production sizes (R multiple of 128) and the
    fallback ladder below that."""
    for R, lo, hi in ((512, 0, 2), (256, 0, 60000), (128, 0, 256),
                      (36, 0, 9)):
        rng = np.random.default_rng(R)
        x = rng.integers(lo, hi, (R, 128)).astype(np.int32)

        def kern(x_ref, o_ref):
            o_ref[:] = pc5._flat_psum_mxu16(x_ref[:]) if hi > 256 else \
                pc5._flat_psum_mxu(x_ref[:])

        with pltpu.force_tpu_interpret_mode():
            out = pl.pallas_call(
                kern,
                out_shape=jax.ShapeDtypeStruct((R, 128), jnp.int32),
            )(jnp.asarray(x))
        exp = np.cumsum(x.reshape(-1).astype(np.int64)).reshape(R, 128)
        np.testing.assert_array_equal(
            np.asarray(out), (exp & 0xFFFFFFFF).astype(np.uint32).astype(
                np.int64).astype(np.int32), err_msg=f"R={R}")


def test_pallas5_rows_batch_roundtrip():
    """Batched-grid kernels: one pallas_call over [B, N], per-row state
    resets at row boundaries, each row's stream bit-exact vs the oracle."""
    rng = np.random.default_rng(3)
    B, N, block, slack = 3, 2048, 512, 256
    rows = np.stack([
        np.clip(500 + np.cumsum(rng.normal(0, 12, N)), -2000,
                2000).astype(np.int16),
        np.cumsum(rng.integers(-40, 40, N)).astype(np.int16),
        np.full(N, -7, np.int16),
    ])
    assert rows.shape == (B, N)
    with pltpu.force_tpu_interpret_mode():
        keys, data, lens, ovf = pc5.encode_w2_rows(
            jnp.asarray(rows), block=block, flavor="zz16", slack=slack)
    assert np.all(np.asarray(ovf) == 0)
    for b in range(B):
        ref = scalar.svb_compress(rows[b], 2, True, 0)
        stream = np.asarray(keys[b]).tobytes() + \
            np.asarray(data[b]).astype(np.uint8).tobytes()[: int(lens[b])]
        assert stream == ref, f"row {b} encode not bit-exact"
    with pltpu.force_tpu_interpret_mode():
        out = pc5.decode_w2_rows(keys, data, block=block,
                                 flavor="zz16", slack=slack)
    np.testing.assert_array_equal(np.asarray(out), rows)


def test_pallas5_rows_overflow_flags_per_row():
    # Row 1 overflows the compact slack; row 0 does not — flags are
    # per-row, not batch-global.
    rng = np.random.default_rng(5)
    N = 2048
    ok = np.clip(500 + np.cumsum(rng.normal(0, 12, N)), -2000,
                 2000).astype(np.int16)
    bad = (np.arange(N, dtype=np.int32) * 200).astype(np.int16)
    with pltpu.force_tpu_interpret_mode():
        _, _, _, ovf = pc5.encode_w2_rows(
            jnp.asarray(np.stack([ok, bad])), block=512, flavor="zz16",
            slack=128)
    assert list(np.asarray(ovf)) == [0, 1]


def test_pallas5_split_replay_channel():
    # The two-channel (extras) reverse pull only triggers naturally at
    # slack > 16384 — far too slow for interpret mode — so force it via
    # the module hook and round-trip the incompressible case.
    rng = np.random.default_rng(11)
    sig = rng.integers(-32768, 32768, 2048).astype(np.int16)
    pc5._FORCE_SPLIT_REPLAY = True
    try:
        _roundtrip5_general(sig, 512)
    finally:
        pc5._FORCE_SPLIT_REPLAY = False


# ---------------------------------------------------------------------------
# Dense leftward-compaction kernels (pallas_dense)
# ---------------------------------------------------------------------------

from vbz_compression_tpu.ops import pallas_dense as pcd  # noqa: E402


def _roundtrip_dense(sig: np.ndarray, block: int):
    N = sig.size
    ref = scalar.svb_compress(sig, 2, True, 0)
    with pltpu.force_tpu_interpret_mode():
        keys, data, total = pcd.encode_w2_dense(
            jnp.asarray(sig), block=block)
    stream = np.asarray(keys).tobytes() + \
        np.asarray(data).astype(np.uint8).tobytes()[: int(total)]
    assert stream == ref, "dense encode not bit-exact vs the scalar oracle"
    keysA = np.frombuffer(ref[: N // 4], np.uint8)
    datab = np.frombuffer(ref[N // 4:], np.uint8)
    boffs = pc4.block_offsets_from_keys(jnp.asarray(keysA), block)
    with pltpu.force_tpu_interpret_mode():
        out = pcd.decode_w2_dense(
            jnp.asarray(keysA), jnp.asarray(datab.astype(np.int8)),
            boffs, block=block)
    np.testing.assert_array_equal(np.asarray(out), sig)


def test_dense_incompressible():
    # The target regime: ~every delta needs two bytes, few code-0 slots.
    rng = np.random.default_rng(9)
    sig = rng.integers(-32768, 32768, 4096).astype(np.int16)
    _roundtrip_dense(sig, 512)


def test_dense_all_two_byte():
    # c0_sum == 0: the network must be a pure pass-through of the
    # interleaved layout (D == 0 everywhere).
    sig = np.cumsum(np.full(2048, 300, np.int64)).astype(np.int16)
    _roundtrip_dense(sig, 512)


def test_dense_signal_content():
    # c0_sum ~ V (smooth walk): worst case for the leftward depth — every
    # displacement bit is exercised, including the gated upper stages.
    rng = np.random.default_rng(0)
    sig = np.clip(500 + np.cumsum(rng.normal(0, 12, 4096)),
                  -2000, 2000).astype(np.int16)
    _roundtrip_dense(sig, 1024)


def test_dense_mixed_codes():
    rng = np.random.default_rng(7)
    sig = np.cumsum(rng.integers(-400, 400, 4096)).astype(np.int16)
    _roundtrip_dense(sig, 512)


def test_dense_multiblock_offsets():
    # Several blocks with different c0 densities: alignment carries and
    # block offsets must chain exactly like the general kernel's.
    rng = np.random.default_rng(3)
    a = rng.integers(-32768, 32768, 1024).astype(np.int16)
    b = np.clip(500 + np.cumsum(rng.normal(0, 12, 1024)),
                -2000, 2000).astype(np.int16)
    c = np.cumsum(rng.integers(-200, 200, 2048)).astype(np.int16)
    _roundtrip_dense(np.concatenate([a, b, c]), 512)


def test_dense_wrap_extremes():
    # 16-bit wrapped deltas at the overflow boundary.
    sig = np.array([-32768, 32767] * 1024, np.int16)
    _roundtrip_dense(sig, 512)


@pytest.mark.slow
def test_dense_both_gates():
    # block 16384 -> d_bits 14 -> BOTH gate groups (9 and 13) exist; a
    # smooth walk pushes c0_sum past each boundary so every gated stage
    # group runs (the on-chip s200 failure mode: a double-push bug hid
    # here — interpret sizes below 16K never instantiate the second gate).
    rng = np.random.default_rng(2)
    sig = np.clip(500 + np.cumsum(rng.normal(0, 12, 16384)),
                  -2000, 2000).astype(np.int16)
    _roundtrip_dense(sig, 16384)


def test_dense_rows_flat_roundtrip():
    """Batched dense kernels: per-row state resets, per-row output
    regions, byte-exact vs the scalar oracle per row."""
    rng = np.random.default_rng(11)
    B, N, block = 3, 2048, 512
    rows = [rng.integers(-32768, 32767, N).astype(np.int16)
            for _ in range(B)]
    rows[1][:512] = np.clip(500 + np.cumsum(
        rng.normal(0, 12, 512)), -2000, 2000).astype(np.int16)
    batch = np.stack(rows)
    x2 = jnp.asarray(batch.reshape(B * N // 128, 128))
    with pltpu.force_tpu_interpret_mode():
        keys, data, lens = pcd.encode_w2_dense_rows_flat(
            x2, B, block=block)
    stride = pcd._row_stride_dense(N, block)
    keys_np = np.asarray(keys).reshape(B, N // 4)
    data_np = np.asarray(data).astype(np.uint8).reshape(B, stride)
    lens_np = np.asarray(lens)
    for i, sig in enumerate(rows):
        ref = scalar.svb_compress(sig, 2, True, 0)
        got = keys_np[i].tobytes() + data_np[i, :lens_np[i]].tobytes()
        assert got == ref, f"row {i} stream mismatch"
    with pltpu.force_tpu_interpret_mode():
        out = pcd.decode_w2_dense_rows_flat(
            jnp.asarray(np.asarray(keys)), jnp.asarray(np.asarray(data)),
            B, block=block)
    np.testing.assert_array_equal(
        np.asarray(out).reshape(B, N), batch)


# ---------------------------------------------------------------------------
# v1 half-byte kernels (pallas_v1 — the deletion-compaction formulation)
# ---------------------------------------------------------------------------

from vbz_compression_tpu.ops import pallas_v1 as pv1  # noqa: E402


def _roundtrip_v1(sig: np.ndarray, block: int, flavor: str):
    zz = flavor == "zz8"
    N = sig.size
    ref = scalar.svb_compress(sig, 1, zz, 1)
    with pltpu.force_tpu_interpret_mode():
        keys, data, total = pv1.encode_v1(jnp.asarray(sig), block=block,
                                          flavor=flavor)
    tn = int(total)
    stream = np.asarray(keys).tobytes() + \
        np.asarray(data).astype(np.uint8).tobytes()[: (tn + 1) // 2]
    assert stream == ref, "v1 encode not bit-exact vs the scalar oracle"
    keysA = np.frombuffer(ref[: N // 4], np.uint8)
    datab = np.frombuffer(ref[N // 4:], np.uint8)
    noffs = pv1.nib_offsets_from_keys(jnp.asarray(keysA), block)
    with pltpu.force_tpu_interpret_mode():
        out = pv1.decode_v1(jnp.asarray(keysA),
                            jnp.asarray(datab.astype(np.int8)), noffs,
                            block=block, flavor=flavor)
    np.testing.assert_array_equal(np.asarray(out), sig)


@pytest.mark.parametrize("flavor", ["zz8", "none8"])
def test_v1_signal(flavor):
    rng = np.random.default_rng(0)
    sig = np.clip(np.cumsum(rng.normal(0, 3, 4096)), -100,
                  100).astype(np.int8)
    _roundtrip_v1(sig, 512, flavor)


@pytest.mark.parametrize("flavor", ["zz8", "none8"])
def test_v1_random(flavor):
    rng = np.random.default_rng(7)
    _roundtrip_v1(rng.integers(-128, 128, 4096).astype(np.int8), 1024,
                  flavor)


def test_v1_all_codes_and_odd_nibbles():
    # Every code (0/1/2/3) plus blocks whose nibble counts are ODD — the
    # cross-block shared-byte carry is the fiddly part of the nibble
    # machinery.
    rng = np.random.default_rng(3)
    sig = np.zeros(2048, np.int8)
    sig[0::4] = 0                                   # code 0 (zz of 0)
    sig[1::4] = 1                                   # small deltas: code 1/2
    sig[2::4] = rng.integers(-128, 128, 512)        # code 2/3 mix
    sig[3::4] = rng.integers(-8, 8, 512)
    _roundtrip_v1(sig, 512, "zz8")


def test_v1_zero_runs():
    sig = np.zeros(2048, np.int8)
    sig[100:110] = 50
    _roundtrip_v1(sig, 512, "zz8")


# ---------------------------------------------------------------------------
# W4 deletion-compaction kernels (pallas_w4)
# ---------------------------------------------------------------------------

from vbz_compression_tpu.ops import pallas_w4 as pw4  # noqa: E402

_W4_ISZ = {"zz32": 4, "none32": 4, "none16": 2, "none8": 1}


def _roundtrip_w4_dense(sig: np.ndarray, block: int, flavor: str):
    N = sig.size
    ref = scalar.svb_compress(sig, _W4_ISZ[flavor], flavor == "zz32", 0)
    with pltpu.force_tpu_interpret_mode():
        keys, data, total = pw4.encode_w4_dense(jnp.asarray(sig),
                                                block=block, flavor=flavor)
    stream = np.asarray(keys).tobytes() + \
        np.asarray(data).astype(np.uint8).tobytes()[: int(total)]
    assert stream == ref, "w4-dense encode not bit-exact"
    keysA = np.frombuffer(ref[: N // 4], np.uint8)
    datab = np.frombuffer(ref[N // 4:], np.uint8)
    boffs = pw4.byte_offsets_from_keys_w4(jnp.asarray(keysA), block)
    with pltpu.force_tpu_interpret_mode():
        out = pw4.decode_w4_dense(
            jnp.asarray(keysA), jnp.asarray(datab.astype(np.int8)), boffs,
            block=block, flavor=flavor)
    np.testing.assert_array_equal(np.asarray(out), sig)


def test_w4_dense_zz32():
    rng = np.random.default_rng(0)
    _roundtrip_w4_dense(
        np.cumsum(rng.integers(-300000, 300000, 2048)).astype(np.int32),
        512, "zz32")


def test_w4_dense_none16_signed():
    rng = np.random.default_rng(1)
    _roundtrip_w4_dense(
        rng.integers(-2000, 2000, 2048).astype(np.int16), 512, "none16")


def test_w4_dense_none8():
    rng = np.random.default_rng(2)
    _roundtrip_w4_dense(
        rng.integers(-128, 128, 2048).astype(np.int8), 512, "none8")


def test_w4_dense_none32_multiblock():
    rng = np.random.default_rng(3)
    _roundtrip_w4_dense(
        rng.integers(0, 1 << 28, 4096, dtype=np.int32), 1024, "none32")


def test_w4_dense_all_code_boundaries():
    # Values at each byte-length boundary (255/256, 65535/65536, 2^24)
    vals = np.array([0, 1, 255, 256, 65535, 65536, (1 << 24) - 1, 1 << 24]
                    * 256, np.int32)
    _roundtrip_w4_dense(vals, 512, "none32")


@pytest.mark.slow
def test_deletion_planes_random_sweep():
    """Property sweep over random content classes for every round-5
    deletion-compaction kernel (dense / v1 / W4): bit-exact streams vs
    the scalar oracle and exact round trips, 8 seeds each."""
    # Interpret-mode pallas graphs are huge; compiling them on top of a
    # full session's worth of live executables segfaulted XLA's CPU
    # compiler in the combined quick+slow run (fine in isolation) —
    # start from a clean compilation cache.
    jax.clear_caches()
    rng0 = np.random.default_rng(99)
    for seed in rng0.integers(0, 1 << 30, 8):
        rng = np.random.default_rng(seed)
        # dense (zz16): random mix of dense and smooth segments
        sig16 = rng.integers(-32768, 32767, 4096).astype(np.int16)
        lo = int(rng.integers(0, 2048))
        sig16[lo:lo + 1024] = np.clip(
            np.cumsum(rng.normal(0, 10, 1024)), -2000, 2000)
        _roundtrip_dense(sig16, 512)
        # v1 (int8): arbitrary bytes + zero runs
        sig8 = rng.integers(-128, 128, 2048).astype(np.int8)
        sig8[: int(rng.integers(0, 1024))] = 0
        _roundtrip_v1(sig8, 512, "zz8")
        _roundtrip_v1(sig8, 512, "none8")
        # W4: values spanning all code widths
        mag = rng.choice([7, 200, 60_000, 1 << 25], 2048)
        sig32 = (rng.integers(-1, 2, 2048) * mag).astype(np.int32)
        _roundtrip_w4_dense(sig32, 512, "none32")
        _roundtrip_w4_dense(np.cumsum(sig32).astype(np.int32), 512, "zz32")
