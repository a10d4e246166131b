"""Multi-device data-parallel codec tests on the virtual 8-device CPU mesh."""

import numpy as np

import jax
import jax.numpy as jnp

from vbz_compression_tpu.ops import scalar
from vbz_compression_tpu.parallel import sharded


def test_batch_encode_decode_sharded_roundtrip():
    assert len(jax.devices()) == 8
    mesh = sharded.make_mesh()
    B, N = 16, 512
    rng = np.random.default_rng(0)
    chunks = [rng.integers(-3000, 3000, rng.integers(100, N + 1),
                           dtype=np.int16) for _ in range(B)]
    batch, lens = sharded.pad_chunks(chunks, pad_to=N)

    xb = sharded.shard_batch(mesh, batch)
    lb = sharded.shard_batch(mesh, lens)
    streams, stream_lens, total = sharded.batch_encode_sharded(
        xb, lb, mesh=mesh, integer_size=2, use_zigzag=True)

    # Bit-exact per-row streams vs the oracle.
    streams_np = np.asarray(streams)
    stream_lens_np = np.asarray(stream_lens)
    for i, c in enumerate(chunks):
        ref = scalar.svb_compress(c, 2, True, 0)
        assert streams_np[i, : stream_lens_np[i]].tobytes() == ref
    assert int(total) == stream_lens_np.sum()

    out, ok = sharded.batch_decode_sharded(
        streams, lb, sharded.shard_batch(mesh, stream_lens_np), mesh=mesh,
        integer_size=2, use_zigzag=True, out_n=N)
    assert np.asarray(ok).all()
    out_np = np.asarray(out)
    for i, c in enumerate(chunks):
        np.testing.assert_array_equal(out_np[i, : c.size], c)


def test_dryrun_multichip_entrypoint():
    import __graft_entry__ as graft

    graft.dryrun_multichip(8)


def test_entry_compiles():
    import __graft_entry__ as graft

    fn, args = graft.entry()
    stream, total = jax.jit(fn)(*args)
    assert int(total) > 0


def test_pallas_sharded_roundtrip():
    """Pallas data plane under shard_map (interpret mode on the CPU mesh):
    codec5 batched-grid kernels over the 8-device mesh."""
    from jax.experimental.pallas import tpu as pltpu

    mesh = sharded.make_mesh()
    rng = np.random.default_rng(0)
    B, N = 8, 2048
    sig = np.clip(500 + np.cumsum(rng.normal(0, 12, (B, N)), axis=1),
                  -2000, 2000).astype(np.int16)
    with pltpu.force_tpu_interpret_mode():
        k5, d5, l5, t5, novf = sharded.batch_encode_sharded_pallas5(
            jnp.asarray(sharded.flatten_rows(sig)), mesh=mesh, batch=B,
            block=512, slack=256)
        out5 = sharded.batch_decode_sharded_pallas5(
            k5, d5, mesh=mesh, batch=B, block=512, slack=256)
    assert int(np.asarray(novf).sum()) == 0
    np.testing.assert_array_equal(
        np.asarray(out5).reshape(B, N), sig)
    assert int(t5) == int(np.asarray(l5).sum()) + B * N // 4
