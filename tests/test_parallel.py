"""Data-parallel tests on the 8-virtual-device CPU mesh.

The JAX host-platform device split is the "fake backend" for exercising mesh
sharding + collectives without TPU hardware (SURVEY.md §4).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from building_gan_tpu.data import batching
from building_gan_tpu.models import VoxelGNNDiscriminator, VoxelGNNGenerator
from building_gan_tpu.parallel import dp, mesh as meshlib
from building_gan_tpu.train.state import create_train_state
from building_gan_tpu.train.step import make_train_step

from test_train import tiny_cfg


def test_mesh_has_8_devices():
    m = meshlib.make_mesh()
    assert m.devices.size == 8


def test_dp_step_runs_and_aggregates(synthetic_samples, small_cfg):
    cfg = tiny_cfg(small_cfg, PACK_GRAPHS=2)
    m = meshlib.make_mesh(4)
    packs = batching.pack_graphs(synthetic_samples, cfg)  # 8 samples, 2/pack
    assert len(packs) >= 4
    stacked = batching.stack_packs(packs[:4])

    gen = VoxelGNNGenerator(configuration=cfg)
    disc = VoxelGNNDiscriminator(configuration=cfg)
    state, tx_g, tx_d = create_train_state(cfg, gen, disc, packs[0], jax.random.key(0), 10)
    pstep = dp.make_parallel_train_step(cfg, gen, disc, tx_g, tx_d, m)

    state2, metrics = pstep(state, stacked, jax.random.key(1))
    assert int(state2.step) == 1
    for k in ("g_loss", "d_loss", "f1", "f1_min", "accuracy"):
        assert np.isfinite(float(metrics[k])), k


def test_dp_equivalence_with_single_device(synthetic_samples, small_cfg):
    """Same batch on every shard + same RNG == a single-device step."""
    cfg = tiny_cfg(small_cfg, PACK_GRAPHS=2)
    m = meshlib.make_mesh(4)
    pack = batching.pack_graphs(synthetic_samples[:2], cfg)[0]
    stacked = batching.stack_packs([pack] * 4)

    gen = VoxelGNNGenerator(configuration=cfg)
    disc = VoxelGNNDiscriminator(configuration=cfg)
    state, tx_g, tx_d = create_train_state(cfg, gen, disc, pack, jax.random.key(0), 10)

    single = jax.jit(make_train_step(cfg, gen, disc, tx_g, tx_d))
    multi = dp.make_parallel_train_step(cfg, gen, disc, tx_g, tx_d, m, fold_device_rng=False)

    s1, m1 = single(state, pack, jax.random.key(7))
    s2, m2 = multi(state, stacked, jax.random.key(7))

    for k in ("g_loss", "d_loss", "f1"):
        assert np.isclose(float(m1[k]), float(m2[k]), rtol=1e-4, atol=1e-5), k
    leaves1 = jax.tree.leaves(s1.params_g)
    leaves2 = jax.tree.leaves(s2.params_g)
    for a, b in zip(leaves1, leaves2):
        np.testing.assert_allclose(np.array(a), np.array(b), rtol=1e-4, atol=1e-6)


def test_dp_null_fill_equivalence(synthetic_samples, small_cfg):
    """Epoch tails: real pack + null fill packs == the real pack alone.

    The weighted cross-device aggregation must give zero weight to all-masked
    null packs (VERDICT r1 weak #7 — no gradient/metric double counting).
    """
    from building_gan_tpu.data.pipeline import null_like

    cfg = tiny_cfg(small_cfg, PACK_GRAPHS=2)
    m = meshlib.make_mesh(4)
    pack = batching.pack_graphs(synthetic_samples[:2], cfg)[0]
    stacked = batching.stack_packs([pack] + [null_like(pack)] * 3)

    gen = VoxelGNNGenerator(configuration=cfg)
    disc = VoxelGNNDiscriminator(configuration=cfg)
    state, tx_g, tx_d = create_train_state(cfg, gen, disc, pack, jax.random.key(0), 10)

    single = jax.jit(make_train_step(cfg, gen, disc, tx_g, tx_d))
    multi = dp.make_parallel_train_step(cfg, gen, disc, tx_g, tx_d, m, fold_device_rng=False)

    s1, m1 = single(state, pack, jax.random.key(7))
    s2, m2 = multi(state, stacked, jax.random.key(7))

    for k in ("g_loss", "d_loss", "f1", "f1_min", "accuracy"):
        assert np.isclose(float(m1[k]), float(m2[k]), rtol=1e-4, atol=1e-5), k
    for a, b in zip(jax.tree.leaves(s1.params_g), jax.tree.leaves(s2.params_g)):
        np.testing.assert_allclose(np.array(a), np.array(b), rtol=1e-4, atol=1e-6)


def test_parallel_eval_equivalence(synthetic_samples, small_cfg):
    """Sharded eval over 4 devices == sequential per-pack eval (incl. a null
    fill pack), scores aggregated from psum-ed confusion matrices."""
    from building_gan_tpu.data.pipeline import null_like
    from building_gan_tpu.train.metrics import _scores_from_cm
    from building_gan_tpu.train.step import make_eval_step

    # f32: the eager reference recomputation below must match the jitted
    # sharded program bit-for-bit on argmax ties, which bf16 can't guarantee
    cfg = tiny_cfg(small_cfg, PACK_GRAPHS=2, COMPUTE_DTYPE="float32")
    m = meshlib.make_mesh(4)
    packs = batching.pack_graphs(synthetic_samples[:6], cfg)[:3]
    stacked = batching.stack_packs(packs + [null_like(packs[0])])

    gen = VoxelGNNGenerator(configuration=cfg)
    disc = VoxelGNNDiscriminator(configuration=cfg)
    state, tx_g, tx_d = create_train_state(cfg, gen, disc, packs[0], jax.random.key(0), 10)

    peval = dp.make_parallel_eval_step(cfg, gen, disc, m)
    mp = jax.device_get(peval(state, stacked, jax.random.key(3)))

    # sequential reference: same per-device keys, global CM
    seval = jax.jit(make_eval_step(cfg, gen, disc))
    import jax.numpy as jnp
    from building_gan_tpu.train import metrics as M

    cm_total = None
    f1_min = np.inf
    for d, pack in enumerate(packs):
        key = jax.random.fold_in(jax.random.key(3), d)
        kz, kgum = jax.random.split(key)
        # must draw z with the SAME sampler the eval step uses (train/step.py:212)
        from building_gan_tpu.ops.rng import normal_box_muller

        z = normal_box_muller(kz, (pack.voxel_x.shape[0], cfg.Z_DIM), dtype=jnp.float32)
        logits, label_hard, _ = gen.apply(
            {"params": state.params_g}, pack, z, deterministic=True, rngs={"gumbel": kgum}
        )
        y_pred = jnp.argmax(label_hard, axis=-1)
        mm = M.compute_metrics(
            jnp.array(pack.voxel_type), y_pred, jnp.array(pack.voxel_mask),
            jnp.array(pack.voxel_graph_id), jnp.array(pack.graph_mask),
        )
        cm_total = mm["confusion_matrix"] if cm_total is None else cm_total + mm["confusion_matrix"]
        f1_min = min(f1_min, float(mm["f1_min"]))
    want = _scores_from_cm(cm_total)
    assert np.isclose(float(mp["f1"]), float(want["f1"]), rtol=1e-4, atol=1e-5)
    assert np.isclose(float(mp["accuracy"]), float(want["accuracy"]), rtol=1e-4, atol=1e-5)
    assert np.isclose(float(mp["f1_min"]), f1_min, rtol=1e-4, atol=1e-5)
