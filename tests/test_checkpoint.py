"""Checkpoint tests: msgpack round-trip, quirk-Q11 patching, torch converter."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from building_gan_tpu.checkpoint import ckpt
from building_gan_tpu.checkpoint.torch_compat import (
    generator_params_to_torch,
    torch_to_generator_params,
)
from building_gan_tpu.data import batching
from building_gan_tpu.models import VoxelGNNGenerator, VoxelGNNDiscriminator
from building_gan_tpu.train.state import create_train_state

from test_train import tiny_cfg


def _make_state(synthetic_samples, small_cfg):
    cfg = tiny_cfg(small_cfg)
    packed = batching.pack_graphs(synthetic_samples[:2], cfg)[0]
    gen = VoxelGNNGenerator(configuration=cfg)
    disc = VoxelGNNDiscriminator(configuration=cfg)
    state, _, _ = create_train_state(cfg, gen, disc, packed, jax.random.key(0), 10)
    return cfg, state


def test_ckpt_roundtrip(tmp_path, synthetic_samples, small_cfg):
    cfg, state = _make_state(synthetic_samples, small_cfg)
    meta = {"epoch_start": 7, "best_f1_score": 0.5}
    ckpt.save_states(str(tmp_path), state, meta)
    assert ckpt.exists(str(tmp_path))
    restored, meta2 = ckpt.load_states(str(tmp_path), state)
    assert meta2["epoch_start"] == 7
    for a, b in zip(jax.tree.leaves(state.params_g), jax.tree.leaves(restored.params_g)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_ckpt_patch_epoch_start(tmp_path, synthetic_samples, small_cfg):
    """Quirk Q11: non-improving epochs only advance the resume cursor."""
    cfg, state = _make_state(synthetic_samples, small_cfg)
    ckpt.save_states(str(tmp_path), state, {"epoch_start": 3, "best_f1_score": 0.9})
    ckpt.patch_epoch_start(str(tmp_path), 12)
    restored, meta = ckpt.load_states(str(tmp_path), state)
    assert meta["epoch_start"] == 12
    assert meta["best_f1_score"] == 0.9  # best weights/metadata untouched


def test_ckpt_migrates_round1_opt_g_layout(tmp_path, synthetic_samples, small_cfg):
    """A checkpoint saved with plain optax.adam for G (pre-inject_hyperparams)
    restores into the current TrainState instead of erroring (ADVICE r2)."""
    import optax

    cfg, state = _make_state(synthetic_samples, small_cfg)
    # forge the old layout: opt_g as a plain adam state over the same params
    tx_old = optax.adam(cfg.LEARNING_RATE_GENERATOR, b1=cfg.BETAS[0], b2=cfg.BETAS[1])
    opt_g_old = tx_old.init(jax.device_get(state.params_g))
    # advance the inner count so the migration has something to carry over
    inner = opt_g_old[0]._replace(count=jnp.asarray(42, jnp.int32))
    old_state = state.replace(opt_g=(inner, opt_g_old[1]))
    ckpt.save_states(str(tmp_path), old_state, {"epoch_start": 5, "best_f1_score": 0.1})

    restored, meta = ckpt.load_states(str(tmp_path), state)
    assert meta["epoch_start"] == 5
    assert int(restored.opt_g.count) == 42
    assert int(restored.opt_g.inner_state[0].count) == 42
    for a, b in zip(
        jax.tree.leaves(state.params_g), jax.tree.leaves(restored.params_g)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # restored state must still drive the optimizer
    from building_gan_tpu.train.state import set_g_lr

    _ = set_g_lr(restored, 1e-4)


def test_torch_converter_roundtrip(synthetic_samples, small_cfg):
    """flax -> torch-layout -> flax must be the identity."""
    cfg, state = _make_state(synthetic_samples, small_cfg)
    params = jax.device_get(state.params_g)
    sd = generator_params_to_torch(params, cfg)
    # torch Linear layout: (out, in)
    assert sd["mlp_encoder.0.weight"].shape[0] == cfg.GENERATOR_HIDDEN_DIM
    back = torch_to_generator_params(sd, cfg, params)
    flat_a = jax.tree.leaves(params)
    flat_b = jax.tree.leaves(back)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_torch_converter_key_layout(synthetic_samples, small_cfg):
    """Spot-check the reference state_dict key names (models.py layout)."""
    cfg, state = _make_state(synthetic_samples, small_cfg)
    sd = generator_params_to_torch(jax.device_get(state.params_g), cfg)
    assert "matched_features_encoder.0.weight" in sd
    assert "encoder.module_0.lin.weight" in sd
    assert "encoder.module_0.att_src" in sd
    assert "encoder.module_1.mean_scale" in sd  # GraphNorm
    assert "decoder.12.weight" in sd  # final 7-class head
    assert sd["decoder.12.weight"].shape[0] == 7


def test_torch_converter_discriminator_roundtrip(synthetic_samples, small_cfg):
    from building_gan_tpu.checkpoint.torch_compat import (
        discriminator_params_to_torch,
        torch_to_discriminator_params,
    )

    cfg, state = _make_state(synthetic_samples, small_cfg)
    params = jax.device_get(state.params_d)
    sd = discriminator_params_to_torch(params, cfg)
    assert "mlp_encoder.0.weight" in sd
    assert "decoder.6.weight" in sd
    assert sd["decoder.6.weight"].shape[0] == 1  # critic scalar head
    back = torch_to_discriminator_params(sd, cfg, params)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(back)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_latest_ckpt_roundtrip_and_preference(tmp_path, synthetic_samples, small_cfg):
    """CKPT_LATEST_INTERVAL crash recovery: save_latest/load_latest round-trip,
    and the resume preference picks whichever cursor is further along (the
    trainer mirrors this logic in __init__ — TRAINING.md OOM post-mortem)."""
    cfg, state = _make_state(synthetic_samples, small_cfg)
    d = str(tmp_path)
    ckpt.save_states(d, state, {"epoch_start": 100, "best_f1_score": 0.5})
    # mutate one param so the two checkpoints are distinguishable
    newer = state.replace(
        params_g=jax.tree.map(lambda a: a + 1.0, state.params_g)
    )
    ckpt.save_latest(d, newer, {"epoch_start": 250, "best_f1_score": 0.5, "is_latest": True})

    best, best_meta = ckpt.load_states(d, state)
    late, late_meta = ckpt.load_latest(d, state)
    assert best_meta["epoch_start"] == 100 and late_meta["epoch_start"] == 250
    a0 = jax.tree.leaves(best.params_g)[0]
    b0 = jax.tree.leaves(late.params_g)[0]
    np.testing.assert_allclose(np.asarray(b0), np.asarray(a0) + 1.0, rtol=1e-6)

    # the preference rule (as implemented in Trainer.__init__)
    pick = late if late_meta["epoch_start"] > best_meta["epoch_start"] else best
    assert pick is late
    # and with a STALE latest, best wins
    ckpt.save_latest(d, newer, {"epoch_start": 50, "best_f1_score": 0.5})
    _, late_meta = ckpt.load_latest(d, state)
    pick = "latest" if late_meta["epoch_start"] > best_meta["epoch_start"] else "best"
    assert pick == "best"
