"""Narrow-GEMM row folding (ops/gemm_pack.py): exactness and model parity.

The pack is algebra, not approximation — off-diagonal kron blocks multiply by
exact zeros — so packed and plain paths must agree to reduction-order noise
(f32: ~1e-6), and PackedDense must be checkpoint-interchangeable with
nn.Dense.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from building_gan_tpu.config import Configuration
from building_gan_tpu.ops.gemm_pack import PackedDense, packed_matmul, plan_pack


class TestPlan:
    def test_wide_layers_not_packed(self):
        assert plan_pack(166320, 128, 130) == 1
        assert plan_pack(166320, 524, 128) == 1

    def test_narrow_layers_fold(self):
        # hourglass bottleneck 2 -> 1(+2 att): a large fold must win
        k = plan_pack(166320, 2, 3)
        assert k > 8 and 166320 % k == 0
        # 64 -> 32(+2): exactly the 2x boundary case still packs
        assert plan_pack(166320, 64, 34) == 2

    def test_indivisible_m_or_marginal_win_stays_plain(self):
        assert plan_pack(7919, 2, 3) == 1  # prime M: no divisor
        # cin=128 full K-tile: no k improves
        assert plan_pack(166320, 128, 64) == 1

    def test_cost_model_monotonic_win(self):
        # the chosen k never exceeds one K/N tile unless it still wins
        m = 105 * 1584
        for cin, n in [(1, 4), (4, 6), (8, 10), (16, 18), (32, 34)]:
            k = plan_pack(m, cin, n)
            assert m % k == 0
            assert (m // k) * max(1, (k * cin + 127) // 128) * max(
                1, (k * n + 127) // 128
            ) <= m // 2  # strict >=2x rule


class TestPackedMatmul:
    @pytest.mark.parametrize("cin,n", [(2, 3), (4, 6), (16, 18), (64, 34), (1, 4)])
    def test_matches_plain_matmul_f32(self, cin, n):
        key = jax.random.PRNGKey(0)
        kx, kw = jax.random.split(key)
        x = jax.random.normal(kx, (5, 1584, cin), jnp.float32)
        w = jax.random.normal(kw, (cin, n), jnp.float32)
        np.testing.assert_allclose(
            np.asarray(packed_matmul(x, w)), np.asarray(x @ w), rtol=1e-6, atol=1e-6
        )

    def test_matches_plain_matmul_bf16(self):
        key = jax.random.PRNGKey(1)
        kx, kw = jax.random.split(key)
        x = jax.random.normal(kx, (4, 1584, 4), jnp.bfloat16)
        w = jax.random.normal(kw, (4, 6), jnp.bfloat16)
        got = np.asarray(packed_matmul(x, w), dtype=np.float32)
        want = np.asarray(x @ w, dtype=np.float32)
        np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)

    def test_gradients_match(self):
        key = jax.random.PRNGKey(2)
        kx, kw = jax.random.split(key)
        x = jax.random.normal(kx, (3, 1584, 8), jnp.float32)
        w = jax.random.normal(kw, (8, 10), jnp.float32)

        def loss_packed(w_, x_):
            return jnp.sum(jnp.sin(packed_matmul(x_, w_)))

        def loss_plain(w_, x_):
            return jnp.sum(jnp.sin(x_ @ w_))

        gw_p, gx_p = jax.grad(loss_packed, argnums=(0, 1))(w, x)
        gw, gx = jax.grad(loss_plain, argnums=(0, 1))(w, x)
        # w-grad reduces over all M rows: different reduction order between
        # the packed and plain lowerings => f32 noise scales with the sum
        np.testing.assert_allclose(np.asarray(gw_p), np.asarray(gw), rtol=1e-4, atol=1e-2)
        np.testing.assert_allclose(np.asarray(gx_p), np.asarray(gx), rtol=1e-5, atol=1e-5)


class TestPackedDense:
    def test_param_tree_matches_nn_dense(self):
        x = jnp.ones((2, 1584, 16))
        pd = PackedDense(features=8).init(jax.random.PRNGKey(0), x)
        d = nn.Dense(features=8).init(jax.random.PRNGKey(0), x)
        assert jax.tree_util.tree_structure(pd) == jax.tree_util.tree_structure(d)
        # identical initializers + same rng => identical values
        for a, b in zip(jax.tree_util.tree_leaves(pd), jax.tree_util.tree_leaves(d)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_same_output_as_nn_dense(self):
        x = jax.random.normal(jax.random.PRNGKey(3), (2, 1584, 16), jnp.float32)
        params = nn.Dense(features=8).init(jax.random.PRNGKey(0), x)
        y_plain = nn.Dense(features=8).apply(params, x)
        y_packed = PackedDense(features=8).apply(params, x)
        np.testing.assert_allclose(
            np.asarray(y_packed), np.asarray(y_plain), rtol=1e-6, atol=1e-6
        )


def _tiny_cfg(**kw):
    cfg = Configuration()
    cfg.COMPUTE_DTYPE = "float32"
    for k, v in kw.items():
        setattr(cfg, k, v)
    return cfg


class TestModelParity:
    """Pack on/off produce the same generator logits and critic scores on the
    same params (f32; the fold is exact up to reduction order)."""

    def _batch(self, cfg):
        from building_gan_tpu.data import preprocess, synthetic
        from building_gan_tpu.data.grid import pack_grid_multi

        samples = []
        for i in range(6):
            g, l, v = synthetic.generate_building(seed=1000 + i)
            samples.append(preprocess.process_building(g, l, v, cfg, f"{i:06d}"))
        return pack_grid_multi(samples, cfg, graphs_per_slot=3)

    def test_generator_and_critic_parity(self):
        from building_gan_tpu.models.grid_models import (
            GridVoxelGNNDiscriminator,
            GridVoxelGNNGenerator,
        )

        cfg_off = _tiny_cfg(PACK_NARROW_GEMMS=False)
        cfg_on = _tiny_cfg(PACK_NARROW_GEMMS=True)
        batch = self._batch(cfg_off)
        B = batch.x.shape[0]
        R = batch.x.shape[1] * batch.x.shape[2] * batch.x.shape[3]
        z = jax.random.normal(jax.random.PRNGKey(7), (B, R, cfg_off.Z_DIM), jnp.float32)

        g_off = GridVoxelGNNGenerator(cfg_off)
        g_on = GridVoxelGNNGenerator(cfg_on)
        rngs = {"params": jax.random.PRNGKey(0), "gumbel": jax.random.PRNGKey(1)}
        params = g_off.init(rngs, batch, z, deterministic=True)
        logits_off, hard_off, _ = g_off.apply(
            params, batch, z, deterministic=True, rngs={"gumbel": jax.random.PRNGKey(2)}
        )
        logits_on, hard_on, _ = g_on.apply(
            params, batch, z, deterministic=True, rngs={"gumbel": jax.random.PRNGKey(2)}
        )
        np.testing.assert_allclose(
            np.asarray(logits_on), np.asarray(logits_off), rtol=2e-4, atol=2e-4
        )
        np.testing.assert_array_equal(np.asarray(hard_on), np.asarray(hard_off))

        d_off = GridVoxelGNNDiscriminator(cfg_off)
        d_on = GridVoxelGNNDiscriminator(cfg_on)
        dparams = d_off.init(jax.random.PRNGKey(0), batch, hard_off, deterministic=True)
        s_off = d_off.apply(dparams, batch, hard_off, deterministic=True)
        s_on = d_on.apply(dparams, batch, hard_off, deterministic=True)
        np.testing.assert_allclose(
            np.asarray(s_on), np.asarray(s_off), rtol=2e-4, atol=2e-4
        )
