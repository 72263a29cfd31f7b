"""HOURGLASS_MIN_CHANNELS — the wider-bottleneck architecture flag.

The reference hourglass (models.py:68-90) halves 128 down to 1 channel; on
the MXU those <=64-channel GEMMs under-fill 128x128 tiles (docs/PERF.md
§13.3).  The flag clamps the halving at a floor — a DIFFERENT architecture
(parameter shapes change), so it is opt-in; these tests pin the schedule
algebra, the model wiring, and the roofline threading.  Default (1) must be
reference-exact: every other suite test runs with it and pins that.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from building_gan_tpu.config import Configuration
from building_gan_tpu.models.grid_layers import hourglass_channels


class TestSchedule:
    def test_reference_exact_at_default(self):
        # hidden=128, repeat=7 -> 64..1..128 (reference models.py:68-90)
        assert hourglass_channels(128, 7) == [
            64, 32, 16, 8, 4, 2, 1, 2, 4, 8, 16, 32, 64, 128,
        ]

    def test_clamp(self):
        assert hourglass_channels(128, 7, 32) == [
            64, 32, 32, 32, 32, 32, 32, 32, 32, 32, 32, 32, 64, 128,
        ]
        # clamp at hidden_dim flattens the whole stack (still exits at hidden)
        assert hourglass_channels(64, 3, 64) == [64, 64, 64, 64, 64, 64]

    def test_out_of_range_min_channels_rejected(self):
        # > hidden_dim would widen the recovery tail and break the hidden_dim
        # exit every caller reshapes against (ADVICE r4); <= 0 is nonsense
        with pytest.raises(ValueError):
            hourglass_channels(64, 3, 128)
        with pytest.raises(ValueError):
            hourglass_channels(64, 3, 0)
        with pytest.raises(ValueError):
            hourglass_channels(64, 3, -2)

    def test_last_entry_recovers_hidden_dim(self):
        for hidden, repeat, mc in [(128, 7, 1), (128, 7, 32), (64, 3, 16), (64, 3, 64)]:
            assert hourglass_channels(hidden, repeat, mc)[-1] == hidden


def _tiny_cfg(**kw):
    cfg = Configuration()
    cfg.COMPUTE_DTYPE = "float32"
    for k, v in kw.items():
        setattr(cfg, k, v)
    return cfg


def _batch(cfg):
    from building_gan_tpu.data import preprocess, synthetic
    from building_gan_tpu.data.grid import pack_grid_multi

    samples = []
    for i in range(4):
        g, l, v = synthetic.generate_building(seed=2000 + i)
        samples.append(preprocess.process_building(g, l, v, cfg, f"{i:06d}"))
    return pack_grid_multi(samples, cfg, graphs_per_slot=2)


@pytest.mark.core
class TestModelWiring:
    def test_grid_models_run_and_bottleneck_widens(self):
        from building_gan_tpu.models.grid_models import (
            GridVoxelGNNDiscriminator,
            GridVoxelGNNGenerator,
        )

        cfg = _tiny_cfg(HOURGLASS_MIN_CHANNELS=32)
        batch = _batch(cfg)
        B = batch.x.shape[0]
        R = batch.x.shape[1] * batch.x.shape[2] * batch.x.shape[3]
        z = jax.random.normal(jax.random.PRNGKey(0), (B, R, cfg.Z_DIM), jnp.float32)

        gen = GridVoxelGNNGenerator(cfg)
        rngs = {"params": jax.random.PRNGKey(0), "gumbel": jax.random.PRNGKey(1)}
        params = gen.init(rngs, batch, z, deterministic=True)
        # the G bottleneck conv (index repeat-1 = 6) must be clamped to 32
        mid = params["params"]["encoder"][f"conv_{cfg.GENERATOR_ENCODER_REPEAT - 1}"]
        kernel = jax.tree_util.tree_leaves(
            {k: v for k, v in mid.items() if "lin" in k or "kernel" in str(k)}
        )[0]
        assert 32 in kernel.shape
        logits, hard, _ = gen.apply(
            params, batch, z, deterministic=True, rngs={"gumbel": jax.random.PRNGKey(2)}
        )
        assert np.all(np.isfinite(np.asarray(logits)))

        disc = GridVoxelGNNDiscriminator(cfg)
        dparams = disc.init(jax.random.PRNGKey(0), batch, hard, deterministic=True)
        score = disc.apply(dparams, batch, hard, deterministic=True)
        assert np.all(np.isfinite(np.asarray(score)))

    def test_default_param_tree_unchanged(self):
        """min_channels=1 yields the identical parameter tree as before the
        flag existed (checkpoint compatibility for every existing run)."""
        from building_gan_tpu.models.grid_models import GridVoxelGNNGenerator

        cfg = _tiny_cfg()
        assert cfg.HOURGLASS_MIN_CHANNELS == 1
        batch = _batch(cfg)
        B = batch.x.shape[0]
        R = batch.x.shape[1] * batch.x.shape[2] * batch.x.shape[3]
        z = jax.random.normal(jax.random.PRNGKey(0), (B, R, cfg.Z_DIM), jnp.float32)
        params = GridVoxelGNNGenerator(cfg).init(
            {"params": jax.random.PRNGKey(0), "gumbel": jax.random.PRNGKey(1)},
            batch, z, deterministic=True,
        )
        # reference bottleneck: conv_6 maps 2 -> 1 channel
        mid = params["params"]["encoder"]["conv_6"]
        leaves = jax.tree_util.tree_leaves(mid)
        assert any(lv.shape[-1] == 1 or (lv.ndim == 2 and lv.shape == (2, 1))
                   for lv in leaves)


class TestRooflineThreading:
    def test_floor_mxu_rises_with_clamp(self):
        from building_gan_tpu.utils.roofline import step_work_per_cell

        base = step_work_per_cell(_tiny_cfg())
        wide = step_work_per_cell(_tiny_cfg(HOURGLASS_MIN_CHANNELS=64))
        assert wide.mxu_macs > base.mxu_macs
        assert wide.vpu_ops > base.vpu_ops
