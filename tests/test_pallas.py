"""Pallas fused hourglass kernel: parity vs the XLA grid path.

Runs in interpreter mode on CPU (the real-TPU run happens in the benchmark);
same params, same batch -> same output as GridHourglass(deterministic=True).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from building_gan_tpu.data import grid as gridlib
from building_gan_tpu.models.grid_layers import GridHourglass
from building_gan_tpu.ops.pallas.hourglass import (
    hourglass_channel_pairs,
    hourglass_fwd,
    pack_gat_weights,
)

from test_train import tiny_cfg


def test_hourglass_channel_pairs():
    chans = hourglass_channel_pairs(128, 7)
    assert chans[0] == (128, 64)
    assert chans[6] == (2, 1)
    assert chans[7] == (1, 2)
    assert chans[-1] == (64, 128)
    assert len(chans) == 14


def test_hourglass_channel_pairs_track_the_shared_schedule():
    """The fused packing pairs must be the zip of THE min_channels-aware
    schedule (models.grid_layers.hourglass_channels) — ADVICE r4: a second
    same-named schedule invited a silent reference-only import."""
    from building_gan_tpu.models.grid_layers import hourglass_channels

    for hidden, repeat, mc in [(128, 7, 1), (128, 7, 8), (64, 3, 16), (64, 3, 64)]:
        ch = hourglass_channels(hidden, repeat, mc)
        pairs = hourglass_channel_pairs(hidden, repeat, mc)
        assert pairs == list(zip([hidden] + ch[:-1], ch))
        assert pairs[0][0] == hidden and pairs[-1][1] == hidden


def test_fused_hourglass_parity(synthetic_samples, small_cfg):
    cfg = tiny_cfg(
        small_cfg, GRID_SHAPE=(10, 8, 8), GRID_BATCH=4, GRID_LOCAL_NODES=64,
        GENERATOR_HIDDEN_DIM=32, GENERATOR_ENCODER_REPEAT=3,
    )
    gb = gridlib.pack_grid(synthetic_samples[:4], cfg)
    b, f, y, x_ = gb.mask.shape
    c0 = cfg.GENERATOR_HIDDEN_DIM

    rng = np.random.default_rng(0)
    feats = jnp.array(rng.normal(size=(b, f, y, x_, c0)).astype(np.float32))
    feats = feats * jnp.array(gb.mask)[..., None]
    mask = jnp.array(gb.mask)

    hg = GridHourglass(
        conv_type="GATCONV", hidden_dim=c0, repeat=cfg.GENERATOR_ENCODER_REPEAT,
    )
    variables = hg.init({"params": jax.random.key(0)}, feats, mask, True)
    want = hg.apply(variables, feats, mask, True)

    Ws, atts, vecs = pack_gat_weights(
        jax.device_get(variables["params"]), c0, cfg.GENERATOR_ENCODER_REPEAT
    )
    got = hourglass_fwd(
        feats, mask, Ws, atts, vecs,
        hidden_dim=c0, repeat=cfg.GENERATOR_ENCODER_REPEAT,
        tile=2, interpret=True,
    )
    np.testing.assert_allclose(np.array(got), np.array(want), rtol=1e-4, atol=1e-5)


def test_fused_hourglass_tile_padding(synthetic_samples, small_cfg):
    """Batch not divisible by tile: padded buildings must not leak."""
    cfg = tiny_cfg(
        small_cfg, GRID_SHAPE=(10, 8, 8), GRID_BATCH=3, GRID_LOCAL_NODES=64,
        GENERATOR_HIDDEN_DIM=16, GENERATOR_ENCODER_REPEAT=2,
    )
    gb = gridlib.pack_grid(synthetic_samples[:3], cfg, batch_slots=3)
    b, f, y, x_ = gb.mask.shape
    c0 = 16
    rng = np.random.default_rng(1)
    feats = jnp.array(rng.normal(size=(b, f, y, x_, c0)).astype(np.float32))
    feats = feats * jnp.array(gb.mask)[..., None]
    mask = jnp.array(gb.mask)

    hg = GridHourglass(conv_type="GATCONV", hidden_dim=c0, repeat=2)
    variables = hg.init({"params": jax.random.key(1)}, feats, mask, True)
    want = hg.apply(variables, feats, mask, True)
    Ws, atts, vecs = pack_gat_weights(jax.device_get(variables["params"]), c0, 2)
    got = hourglass_fwd(feats, mask, Ws, atts, vecs, hidden_dim=c0, repeat=2, tile=2, interpret=True)
    np.testing.assert_allclose(np.array(got), np.array(want), rtol=1e-4, atol=1e-5)


def test_fast_infer_parity(synthetic_samples, small_cfg):
    """fast_infer (fused hourglass) matches the flax generator logits."""
    from building_gan_tpu.models import GridVoxelGNNGenerator
    from building_gan_tpu.models import fast_infer

    cfg = tiny_cfg(
        small_cfg, GRID_SHAPE=(10, 8, 8), GRID_BATCH=2, GRID_LOCAL_NODES=64,
        GENERATOR_HIDDEN_DIM=32, GENERATOR_ENCODER_REPEAT=2,
    )
    gb = gridlib.pack_grid(synthetic_samples[:2], cfg)
    gen = GridVoxelGNNGenerator(configuration=cfg, dtype=jnp.float32)
    key = jax.random.key(0)
    z = jax.random.normal(key, gb.mask.shape + (cfg.Z_DIM,))
    variables = gen.init({"params": key, "gumbel": key}, gb, z, deterministic=True)
    want, want_hard, _ = gen.apply(variables, gb, z, deterministic=True, rngs={"gumbel": key})

    packed = fast_infer.prepare(variables["params"], cfg)
    got, got_hard, _ = fast_infer.infer(
        variables["params"], packed, cfg, gb, z, key, tile=2, interpret=True
    )
    np.testing.assert_allclose(np.array(got), np.array(want), rtol=1e-4, atol=1e-5)
    # Gumbel keys differ (flax make_rng folds the module path); just check
    # the hard sample is a valid one-hot
    hard = np.array(got_hard)
    assert np.allclose(hard.sum(axis=-1), 1.0, atol=1e-5)
