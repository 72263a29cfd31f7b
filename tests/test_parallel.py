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
