"""Custom-VJP fused hourglass kernel tests (ops/pallas/gat_train.py).

Interpret mode on CPU.  The XLA reference path is built from the SAME
primitives the real models use (`ops.stencil.stencil_gat_flat` +
`GridGraphNorm`), and gradients are compared against `jax.grad` through that
reference — the kernel's hand-derived attention-softmax + mean_scale-
GraphNorm backward must reproduce autodiff.

All comparisons run under `jax.default_matmul_precision('highest')`: at the
backend's DEFAULT precision the XLA einsums themselves carry bf16-class
error (measured 4.6e-2 on a 48x8 dot on this CPU backend), which would
swamp the parity signal.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from building_gan_tpu.models.grid_layers import GridGraphNorm
from building_gan_tpu.ops import stencil
from building_gan_tpu.ops.pallas import gat_train as GT

GS = (3, 4, 4)
R = int(np.prod(GS))
C = 8
L = 2


def _case(K, seed=0, B=3):
    rng = np.random.default_rng(seed)
    mask = (rng.random((B, R)) > 0.3).astype(np.float32)
    gid = rng.integers(0, K, (B, R)).astype(np.int32)
    x0 = (rng.normal(size=(B, R, C)) * mask[..., None]).astype(np.float32)
    Ws = rng.normal(size=(L, C, C)).astype(np.float32) * 0.3
    atts = rng.normal(size=(L, 2, C)).astype(np.float32) * 0.3
    vecs = rng.normal(size=(L, 4, C)).astype(np.float32) * 0.2
    vecs[:, 1] += 1.0  # gn weight ~1
    vecs[:, 3] += 1.0  # mean_scale ~1
    return jnp.array(mask), jnp.array(gid), jnp.array(x0), jnp.array(Ws), jnp.array(
        atts
    ), jnp.array(vecs)


def _ref_stack(x, Ws, atts, vecs, mask, gid, K):
    """The XLA layer body, from the same primitives GridHourglass uses."""
    for l in range(Ws.shape[0]):
        h = x @ Ws[l]
        a_s = (h * atts[l, 0]).sum(-1).astype(jnp.float32)
        a_d = (h * atts[l, 1]).sum(-1).astype(jnp.float32)
        conv = (
            stencil.stencil_gat_flat(h, a_s, a_d, mask, GS, gid=gid if K > 1 else None)
            + vecs[l, 0]
        )
        z = GridGraphNorm(features=C).apply(
            {
                "params": {
                    "weight": vecs[l, 1],
                    "bias": vecs[l, 2],
                    "mean_scale": vecs[l, 3],
                }
            },
            conv,
            mask,
            gid=gid if K > 1 else None,
            num_graphs=K,
        )
        x = jax.nn.relu(z)
    return x


@pytest.mark.parametrize("K", [1, 2])
def test_fused_layer_forward_and_grads_match_autodiff(K):
    mask, gid, x0, Ws, atts, vecs = _case(K)
    planes = GT.build_planes(mask, gid if K > 1 else None, GS)
    seeds = jnp.zeros((L,), jnp.int32)

    def ker(x, Ws, atts, vecs):
        return GT.hourglass_train(
            x, planes, Ws, atts, vecs, seeds, GS, K=K,
            dropout_rate=0.0, deterministic=True, tile=1, interpret=True,
        )

    def ref(x, Ws, atts, vecs):
        return _ref_stack(x, Ws, atts, vecs, mask, gid, K)

    with jax.default_matmul_precision("highest"):
        y_ref = ref(x0, Ws, atts, vecs)
        y_ker = ker(x0, Ws, atts, vecs)
        np.testing.assert_allclose(np.array(y_ker), np.array(y_ref), atol=2e-5)

        cot = jnp.array(
            np.random.default_rng(9).normal(size=y_ref.shape).astype(np.float32)
        )
        g_ref = jax.grad(lambda *a: jnp.sum(ref(*a) * cot), argnums=(0, 1, 2, 3))(
            x0, Ws, atts, vecs
        )
        g_ker = jax.grad(lambda *a: jnp.sum(ker(*a) * cot), argnums=(0, 1, 2, 3))(
            x0, Ws, atts, vecs
        )
    for name, a, b in zip(("gx", "gW", "gatt", "gvec"), g_ref, g_ker):
        scale = float(jnp.max(jnp.abs(a))) + 1e-6
        np.testing.assert_allclose(
            np.array(b) / scale, np.array(a) / scale, atol=5e-5, err_msg=name
        )


def test_fused_layer_dropout_deterministic_and_consistent():
    """Same seed -> same output; rate=0 == deterministic; and the backward's
    recomputed dropout mask matches the forward's (finite differences)."""
    K = 2
    mask, gid, x0, Ws, atts, vecs = _case(K, seed=3)
    planes = GT.build_planes(mask, gid, GS)
    seeds = jnp.arange(L, dtype=jnp.int32) + 7

    def ker(x, rate, det):
        return GT.hourglass_train(
            x, planes, Ws, atts, vecs, seeds, GS, K=K,
            dropout_rate=rate, deterministic=det, tile=1, interpret=True,
        )

    y1 = ker(x0, 0.4, False)
    y2 = ker(x0, 0.4, False)
    np.testing.assert_array_equal(np.array(y1), np.array(y2))

    np.testing.assert_allclose(
        np.array(ker(x0, 0.0, False)), np.array(ker(x0, 0.3, True)), atol=1e-6
    )

    # directional finite difference vs custom-VJP grad, dropout ON
    with jax.default_matmul_precision("highest"):
        v = jnp.array(
            np.random.default_rng(11).normal(size=x0.shape).astype(np.float32)
        )
        f = lambda x: jnp.sum(ker(x, 0.4, False) ** 2) / x0.size
        g = jax.grad(f)(x0)
        want = float(jnp.vdot(g, v))
        h = 1e-3
        fd = float((f(x0 + h * v) - f(x0 - h * v)) / (2 * h))
    assert np.isclose(fd, want, rtol=2e-2), (fd, want)


@pytest.mark.parametrize("min_ch", [1, 8])
def test_generator_apply_fused_matches_flax(synthetic_samples, small_cfg, min_ch):
    """Full fused generator forward (deterministic) == GridVoxelGNNGenerator.

    min_ch=8 pins the ADVICE r4 fix: the fused packing must follow the
    min_channels-clamped schedule, not the reference-only one (which crashed
    with pad/slice shape mismatches)."""
    from test_train import tiny_cfg

    from building_gan_tpu.data import grid as gridlib
    from building_gan_tpu.models import GridVoxelGNNGenerator
    from building_gan_tpu.models import fast_train as FT

    cfg = tiny_cfg(
        small_cfg,
        GRID_SHAPE=(8, 8, 8),
        GRID_BATCH=2,
        GRID_LOCAL_NODES=64,
        GRID_SLOT_GRAPHS=1,
        COMPUTE_DTYPE="float32",
        HOURGLASS_MIN_CHANNELS=min_ch,
    )
    samples = [s for s in synthetic_samples if int(s[1].location[:, 0].max()) < 8][:2]
    gb = gridlib.pack_grid(samples, cfg)
    gen = GridVoxelGNNGenerator(configuration=cfg)
    key = jax.random.key(0)
    z = jax.random.normal(jax.random.key(1), gb.mask.shape + (cfg.Z_DIM,))
    variables = gen.init({"params": key, "gumbel": key}, gb, z, deterministic=True)

    with jax.default_matmul_precision("highest"):
        want, want_hard, _ = gen.apply(
            variables, gb, z, deterministic=True, rngs={"gumbel": key}
        )
        got, got_hard, _ = FT.generator_apply_fused(
            variables["params"], cfg, gb, z, key, None,
            deterministic=True, tile=1, interpret=True,
        )
    np.testing.assert_allclose(np.array(got), np.array(want), rtol=1e-4, atol=1e-4)
    # gumbel keys differ (flax make_rng folds the module path); just check a
    # valid straight-through one-hot
    hard = np.array(got_hard)
    assert np.allclose(hard.sum(axis=-1), 1.0, atol=1e-5)
    del want_hard


def test_fused_train_step_runs_and_updates(synthetic_samples, small_cfg):
    """The FULL WGAN-GP train step with USE_PALLAS_TRAIN: fused G + fused
    real/fake critic passes, XLA GP double-backward.  One step must produce
    finite losses/metrics and move both parameter sets (interpret mode)."""
    import dataclasses

    from test_train import tiny_cfg

    from building_gan_tpu.data import grid as gridlib
    from building_gan_tpu.models import GridVoxelGNNDiscriminator, GridVoxelGNNGenerator
    from building_gan_tpu.train.state import create_train_state
    from building_gan_tpu.train.step import make_train_step

    cfg = tiny_cfg(
        small_cfg,
        GRID_SHAPE=(8, 8, 8),
        GRID_BATCH=2,
        GRID_LOCAL_NODES=64,
        GRID_SLOT_GRAPHS=1,
        COMPUTE_DTYPE="float32",
        N_CRITIC=2,
    )
    cfg = dataclasses.replace(cfg, USE_PALLAS_TRAIN=True, PALLAS_TRAIN_TILE=1)
    samples = [s for s in synthetic_samples if int(s[1].location[:, 0].max()) < 8][:2]
    gb = gridlib.pack_grid(samples, cfg)

    gen = GridVoxelGNNGenerator(configuration=cfg)
    disc = GridVoxelGNNDiscriminator(configuration=cfg)
    state, tx_g, tx_d = create_train_state(cfg, gen, disc, gb, jax.random.key(0), 10)
    p_g0 = jax.tree.map(np.array, state.params_g)
    p_d0 = jax.tree.map(np.array, state.params_d)

    step = make_train_step(cfg, gen, disc, tx_g, tx_d)
    s1, m = step(state, gb, jax.random.key(7))

    for k, v in m.items():
        # metrics include the (32,) per-graph F1 histogram — check elementwise
        assert np.all(np.isfinite(np.asarray(v))), (k, v)
    moved_g = any(
        not np.allclose(np.array(a), b)
        for a, b in zip(jax.tree.leaves(s1.params_g), jax.tree.leaves(p_g0))
    )
    moved_d = any(
        not np.allclose(np.array(a), b)
        for a, b in zip(jax.tree.leaves(s1.params_d), jax.tree.leaves(p_d0))
    )
    assert moved_g and moved_d


def test_discriminator_apply_fused_matches_flax(synthetic_samples, small_cfg):
    from test_train import tiny_cfg

    from building_gan_tpu.config import NUM_CLASSES
    from building_gan_tpu.data import grid as gridlib
    from building_gan_tpu.models import GridVoxelGNNDiscriminator
    from building_gan_tpu.models import fast_train as FT

    cfg = tiny_cfg(
        small_cfg,
        GRID_SHAPE=(8, 8, 8),
        GRID_BATCH=2,
        GRID_LOCAL_NODES=64,
        GRID_SLOT_GRAPHS=1,
        COMPUTE_DTYPE="float32",
    )
    samples = [s for s in synthetic_samples if int(s[1].location[:, 0].max()) < 8][:2]
    gb = gridlib.pack_grid(samples, cfg)
    disc = GridVoxelGNNDiscriminator(configuration=cfg)
    key = jax.random.key(0)
    label = jax.nn.one_hot(gb.type, NUM_CLASSES, dtype=jnp.float32)
    variables = disc.init({"params": key}, gb, label, deterministic=True)

    with jax.default_matmul_precision("highest"):
        want = disc.apply(variables, gb, label, deterministic=True)
        got = FT.discriminator_apply_fused(
            variables["params"], cfg, gb, label, None,
            deterministic=True, tile=1, interpret=True,
        )
    np.testing.assert_allclose(np.array(got), np.array(want), rtol=1e-4, atol=1e-4)
