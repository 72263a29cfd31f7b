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


@pytest.mark.parametrize(
    "cls",
    [batcherlib.NativeBatcher, batcherlib.PyBatcher]
    if batcherlib.native_available()
    else [batcherlib.PyBatcher],
)
def test_batcher_close_with_blocked_waiters(cls):
    """close() while threads are blocked must unblock them, not crash
    (batcher.cc sb_destroy waits for waiters to drain — no use-after-free)."""
    b = cls(max_batch=4, max_delay_us=50_000)
    errs = []

    def waiter():
        try:
            b.wait(123, timeout_us=10_000_000)
        except (RuntimeError, TimeoutError):
            pass
        except Exception as e:  # pragma: no cover
            errs.append(e)

    def fetcher():
        try:
            b.next_batch(poll_timeout_us=10_000_000)
        except (StopIteration, RuntimeError):
            pass
        except Exception as e:  # pragma: no cover
            errs.append(e)

    threads = [threading.Thread(target=waiter), threading.Thread(target=fetcher)]
    for t in threads:
        t.start()
    time.sleep(0.05)  # let both block
    b.close()
    for t in threads:
        t.join(timeout=5)
    assert not any(t.is_alive() for t in threads)
    assert not errs


def test_server_rejects_oversized_at_submit(server, synthetic_samples):
    """A building exceeding the server grid fails fast in infer(), without
    touching (or wedging) the executor thread."""
    import dataclasses

    local, voxel = synthetic_samples[0]
    big = dataclasses.replace(
        voxel, location=voxel.location + np.array([0, 0, 100], voxel.location.dtype)
    )
    with pytest.raises(ValueError, match="exceeds the server grid"):
        server.infer(local, big, seed=5)
    # server still serves normal traffic afterwards
    ok = server.infer(local, voxel, seed=5, timeout_s=300.0)
    assert ok["logits"].shape == (voxel.x.shape[0], 7)


def test_server_survives_poison_request(server, synthetic_samples):
    """A request that passes submit validation but fails in the executor
    (malformed feature width) fails THAT request; later requests succeed."""
    import dataclasses

    local, voxel = synthetic_samples[0]
    poison = dataclasses.replace(voxel, x=voxel.x[:, :5].copy())  # wrong width
    with pytest.raises(RuntimeError, match="inference batch failed"):
        server.infer(local, poison, seed=9, timeout_s=300.0)
    ok = server.infer(local, voxel, seed=9, timeout_s=300.0)
    assert ok["logits"].shape == (voxel.x.shape[0], 7)


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


def _init_params(cfg, samples, key_seed):
    import jax

    from building_gan_tpu.data import grid as gridlib
    from building_gan_tpu.models import GridVoxelGNNGenerator

    gen = GridVoxelGNNGenerator(configuration=cfg)
    gb = gridlib.pack_grid(samples[:1], cfg, batch_slots=4)
    key = jax.random.key(key_seed)
    z = jnp.zeros(gb.mask.shape + (cfg.Z_DIM,))
    return gen.init({"params": key, "gumbel": key}, gb, z, deterministic=True)["params"]


def test_checkpoint_hot_swap(synthetic_samples, small_cfg):
    """swap_params serves new weights with no restart/recompile; outputs
    after the swap are bit-identical to a server started on those weights."""
    from building_gan_tpu.serving import InferenceServer

    cfg = tiny_cfg(
        small_cfg, LAYOUT="grid", GRID_SHAPE=(10, 8, 8), GRID_LOCAL_NODES=64,
        COMPUTE_DTYPE="float32",
    )
    params_a = _init_params(cfg, synthetic_samples, 0)
    params_b = _init_params(cfg, synthetic_samples, 1)
    local, voxel = synthetic_samples[0]

    srv = InferenceServer(cfg, params_a, max_batch=4, max_delay_ms=5.0).start()
    try:
        before = srv.infer(local, voxel, seed=7)
        assert srv.params_version == 0
        assert srv.swap_params(params_b) == 1
        after = srv.infer(local, voxel, seed=7)
    finally:
        srv.stop()
    assert not np.allclose(before["logits"], after["logits"])

    oracle = InferenceServer(cfg, params_b, max_batch=4, max_delay_ms=5.0).start()
    try:
        want = oracle.infer(local, voxel, seed=7)
    finally:
        oracle.stop()
    np.testing.assert_allclose(after["logits"], want["logits"], rtol=0, atol=1e-6)
    np.testing.assert_array_equal(after["types"], want["types"])


def test_router_named_models_and_swap(synthetic_samples, small_cfg):
    """Named routing isolates models; router-level hot-swap reaches the
    right backend."""
    from building_gan_tpu.serving import RoutingServer

    cfg = tiny_cfg(
        small_cfg, LAYOUT="grid", GRID_SHAPE=(10, 8, 8), GRID_LOCAL_NODES=64,
        COMPUTE_DTYPE="float32",
    )
    params_a = _init_params(cfg, synthetic_samples, 0)
    params_b = _init_params(cfg, synthetic_samples, 1)
    local, voxel = synthetic_samples[0]

    router = RoutingServer()
    try:
        router.add_model("a", cfg, params_a, max_batch=4, max_delay_ms=5.0)
        router.add_model("b", cfg, params_b, max_batch=4, max_delay_ms=5.0)
        ra = router.infer(local, voxel, model="a", seed=3)
        rb = router.infer(local, voxel, model="b", seed=3)
        assert not np.allclose(ra["logits"], rb["logits"])
        # default route is the first registered model
        rdef = router.infer(local, voxel, seed=3)
        np.testing.assert_allclose(rdef["logits"], ra["logits"], rtol=0, atol=1e-6)
        # swap "a" to b's weights through the router
        router.swap_params("a", params_b)
        ra2 = router.infer(local, voxel, model="a", seed=3)
        np.testing.assert_allclose(ra2["logits"], rb["logits"], rtol=0, atol=1e-6)
        snap = router.models()
        assert snap["a"]["params_version"] == 1 and snap["b"]["params_version"] == 0
        with pytest.raises(KeyError):
            router.infer(local, voxel, model="nope")
    finally:
        router.stop()


def test_router_size_bucket_routing(synthetic_samples, small_cfg):
    """With no model name, requests go to the smallest grid that fits —
    the serving analog of GRID_BUCKETS."""
    from building_gan_tpu.serving import RoutingServer

    big_cfg = tiny_cfg(
        small_cfg, LAYOUT="grid", GRID_SHAPE=(10, 8, 8), GRID_LOCAL_NODES=64,
        COMPUTE_DTYPE="float32",
    )
    small_shape = (5, 5, 6)
    small_grid_cfg = big_cfg.replace(GRID_SHAPE=small_shape)
    params = _init_params(big_cfg, synthetic_samples, 0)

    # a building that fits the small bucket and one that does not (the same
    # weights serve both buckets: generator params are grid-shape-free)
    fits_small = next(
        s for s in synthetic_samples
        if (np.asarray(s[1].location).max(axis=0) + 1 <= small_shape).all()
    )
    needs_big = next(
        s for s in synthetic_samples
        if (np.asarray(s[1].location).max(axis=0) + 1 > small_shape).any()
    )

    router = RoutingServer()
    try:
        big = router.add_model("big", big_cfg, params, max_batch=4, max_delay_ms=5.0)
        small = router.add_model(
            "small", small_grid_cfg, params, max_batch=4, max_delay_ms=5.0
        )
        r_small = router.infer(*fits_small, seed=5)
        assert len(small.batch_sizes) == 1 and len(big.batch_sizes) == 0
        r_big = router.infer(*needs_big, seed=5)
        assert len(big.batch_sizes) == 1
        assert r_small["types"].shape[0] == fits_small[1].x.shape[0]
        assert r_big["types"].shape[0] == needs_big[1].x.shape[0]
    finally:
        router.stop()
