"""Inference-server tests: native batcher semantics + batched-vs-alone
determinism of the serving path (building_gan_tpu/serving)."""

import threading
import time

import jax.numpy as jnp
import numpy as np
import pytest

from building_gan_tpu.serving import batcher as batcherlib

from test_train import tiny_cfg


@pytest.mark.parametrize(
    "cls",
    [batcherlib.NativeBatcher, batcherlib.PyBatcher]
    if batcherlib.native_available()
    else [batcherlib.PyBatcher],
)
def test_batcher_forms_batches(cls):
    b = cls(max_batch=4, max_delay_us=50_000)
    for i in range(6):
        b.submit(i)
    first = b.next_batch()
    second = b.next_batch()
    assert sorted(first + second) == list(range(6))
    assert len(first) == 4 and len(second) == 2  # size-triggered then drain
    b.complete(first + second)
    for i in range(6):
        b.wait(i, timeout_us=1_000_000)
    assert b.pending() == 0
    b.shutdown()
    with pytest.raises((RuntimeError, StopIteration)):
        b.submit(99)


@pytest.mark.parametrize(
    "cls",
    [batcherlib.NativeBatcher, batcherlib.PyBatcher]
    if batcherlib.native_available()
    else [batcherlib.PyBatcher],
)
def test_batcher_deadline_closes_partial_batch(cls):
    b = cls(max_batch=64, max_delay_us=30_000)
    b.submit(0)
    t0 = time.monotonic()
    got = b.next_batch(poll_timeout_us=500_000)
    assert got == [0]
    assert time.monotonic() - t0 < 0.4  # closed by deadline, not poll timeout
    b.shutdown()


@pytest.fixture(scope="module")
def server(synthetic_samples, small_cfg):
    import jax

    from building_gan_tpu.data import grid as gridlib
    from building_gan_tpu.models import GridVoxelGNNGenerator
    from building_gan_tpu.serving import InferenceServer

    cfg = tiny_cfg(
        small_cfg, LAYOUT="grid", GRID_SHAPE=(10, 8, 8), GRID_LOCAL_NODES=64,
        COMPUTE_DTYPE="float32",
    )
    gen = GridVoxelGNNGenerator(configuration=cfg)
    gb = gridlib.pack_grid(synthetic_samples[:1], cfg, batch_slots=4)
    key = jax.random.key(0)
    z = jnp.zeros(gb.mask.shape + (cfg.Z_DIM,))
    params = gen.init({"params": key, "gumbel": key}, gb, z, deterministic=True)["params"]
    srv = InferenceServer(cfg, params, max_batch=4, max_delay_ms=20.0).start()
    yield srv
    srv.stop()


def test_server_concurrent_requests_batch_and_match(server, synthetic_samples):
    """Concurrent requests get batched; each result is identical to the same
    request served alone (per-request z/Gumbel seeds, per-graph norms)."""
    samples = synthetic_samples[:4]
    results = [None] * len(samples)

    def worker(i):
        local, voxel = samples[i]
        results[i] = server.infer(local, voxel, seed=100 + i)

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(len(samples))]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    assert all(r is not None for r in results)
    assert any(s > 1 for s in server.batch_sizes), server.batch_sizes

    # served alone (different batch composition) -> same output
    for i, (local, voxel) in enumerate(samples):
        alone = server.infer(local, voxel, seed=100 + i)
        np.testing.assert_allclose(
            alone["logits"], results[i]["logits"], rtol=0, atol=1e-6
        )
        np.testing.assert_array_equal(alone["types"], results[i]["types"])
        n = voxel.x.shape[0]
        assert alone["logits"].shape == (n, 7)
        np.testing.assert_allclose(alone["label_hard"].sum(axis=-1), 1.0, atol=1e-6)
