"""Generator/discriminator forward tests: shapes, ST-Gumbel head, padding.

Mirrors the reference model surface (`building_gan/src/models.py:119-155,
229-245`): G returns (logits, label_hard, label_soft) per voxel node; D
returns per-voxel-node critic scores (quirk Q10 — no graph readout).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from building_gan_tpu.config import NUM_CLASSES
from building_gan_tpu.data import batching
from building_gan_tpu.models import VoxelGNNDiscriminator, VoxelGNNGenerator


@pytest.fixture(scope="module")
def packed(synthetic_samples, small_cfg):
    return batching.pack_graphs(synthetic_samples[:4], small_cfg)[0]


def _init_generator(cfg, batch, key):
    gen = VoxelGNNGenerator(configuration=cfg)
    z = jax.random.normal(key, (batch.voxel_x.shape[0], cfg.Z_DIM))
    variables = gen.init(
        {"params": key, "gumbel": key, "dropout": key}, batch, z, deterministic=True
    )
    return gen, variables, z


def test_generator_forward_shapes(small_cfg, packed):
    key = jax.random.key(0)
    gen, variables, z = _init_generator(small_cfg, packed, key)
    logits, hard, soft = gen.apply(
        variables, packed, z, deterministic=True, rngs={"gumbel": key}
    )
    nv = packed.voxel_x.shape[0]
    assert logits.shape == (nv, NUM_CLASSES)
    assert hard.shape == (nv, NUM_CLASSES)
    assert soft.shape == (nv, NUM_CLASSES)
    hard_np = np.array(hard)
    assert np.allclose(hard_np.sum(axis=1), 1.0, atol=1e-5)
    # forward value is one-hot up to ST float rounding (hard - soft + soft)
    assert np.all((np.abs(hard_np) < 1e-5) | (np.abs(hard_np - 1) < 1e-5))
    assert np.all(np.isfinite(np.array(logits)))


def test_discriminator_forward_shapes(small_cfg, packed):
    key = jax.random.key(1)
    disc = VoxelGNNDiscriminator(configuration=small_cfg)
    label = jax.nn.one_hot(packed.voxel_type, NUM_CLASSES)
    variables = disc.init({"params": key, "dropout": key}, packed, label, deterministic=True)
    score = disc.apply(variables, packed, label, deterministic=True)
    assert score.shape == (packed.voxel_x.shape[0], 1)
    assert np.all(np.isfinite(np.array(score)))


def test_generator_conv_registry(small_cfg, packed):
    """All four conv types build and run (reference models.py:22-31)."""
    key = jax.random.key(2)
    for conv in ["GCNCONV", "GRAPHCONV", "GATCONV", "GATV2CONV"]:
        cfg = small_cfg.replace(
            GENERATOR_CONV_TYPE=conv, GENERATOR_ENCODER_REPEAT=2, GENERATOR_HIDDEN_DIM=16,
            LOCAL_ENCODER_HIDDEN_DIM=16, Z_DIM=8, GENERATOR_MLP_ENCODER_REPEAT=1,
            LOCAL_GRAPH_ENCODER_REPEAT=1,
        )
        gen, variables, z = _init_generator(cfg, packed, key)
        logits, _, _ = gen.apply(variables, packed, z, deterministic=True, rngs={"gumbel": key})
        assert np.all(np.isfinite(np.array(logits)))


def test_padding_invariance(synthetic_samples, small_cfg):
    """Logits on real nodes must not change when pack padding grows."""
    key = jax.random.key(3)
    cfg_small = small_cfg.replace(
        GENERATOR_ENCODER_REPEAT=2, GENERATOR_HIDDEN_DIM=16, LOCAL_ENCODER_HIDDEN_DIM=16,
        Z_DIM=8, GENERATOR_MLP_ENCODER_REPEAT=1, LOCAL_GRAPH_ENCODER_REPEAT=1,
    )
    cfg_big = cfg_small.replace(
        PACK_VOXEL_NODES=cfg_small.PACK_VOXEL_NODES * 2,
        PACK_VOXEL_EDGES=cfg_small.PACK_VOXEL_EDGES * 2,
        PACK_LOCAL_NODES=cfg_small.PACK_LOCAL_NODES * 2,
        PACK_LOCAL_EDGES=cfg_small.PACK_LOCAL_EDGES * 2,
    )
    samples = synthetic_samples[:2]
    p1 = batching.pack_graphs(samples, cfg_small)[0]
    p2 = batching.pack_graphs(samples, cfg_big)[0]

    gen = VoxelGNNGenerator(configuration=cfg_small)
    nv1, nv2 = p1.voxel_x.shape[0], p2.voxel_x.shape[0]
    z1 = jax.random.normal(key, (nv1, cfg_small.Z_DIM))
    z2 = jnp.zeros((nv2, cfg_small.Z_DIM)).at[:nv1].set(z1)
    variables = gen.init({"params": key, "gumbel": key}, p1, z1, deterministic=True)

    logits1, _, _ = gen.apply(variables, p1, z1, deterministic=True, rngs={"gumbel": key})
    logits2, _, _ = gen.apply(variables, p2, z2, deterministic=True, rngs={"gumbel": key})

    n_real = int(p1.voxel_mask.sum())
    np.testing.assert_allclose(
        np.array(logits1[:n_real]), np.array(logits2[:n_real]), rtol=1e-4, atol=1e-5
    )


def test_batch_level_quirk_flags_change_output(small_cfg, packed):
    """Q1/Q5 parity flags must actually alter the computation."""
    key = jax.random.key(4)
    base = small_cfg.replace(
        GENERATOR_ENCODER_REPEAT=2, GENERATOR_HIDDEN_DIM=16, LOCAL_ENCODER_HIDDEN_DIM=16,
        Z_DIM=8, GENERATOR_MLP_ENCODER_REPEAT=1, LOCAL_GRAPH_ENCODER_REPEAT=1,
    )
    quirk = base.replace(BATCH_LEVEL_MATCHING=True, BATCH_LEVEL_GRAPHNORM=True)
    gen_a = VoxelGNNGenerator(configuration=base)
    gen_b = VoxelGNNGenerator(configuration=quirk)
    z = jax.random.normal(key, (packed.voxel_x.shape[0], base.Z_DIM))
    variables = gen_a.init({"params": key, "gumbel": key}, packed, z, deterministic=True)
    la, _, _ = gen_a.apply(variables, packed, z, deterministic=True, rngs={"gumbel": key})
    lb, _, _ = gen_b.apply(variables, packed, z, deterministic=True, rngs={"gumbel": key})
    assert not np.allclose(np.array(la), np.array(lb))
