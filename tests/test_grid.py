"""Grid-layout tests: packing, compatibility, and grid-vs-edge parity.

The parity tests are the load-bearing correctness check of the TPU fast path:
the SAME parameter pytree drives both the edge-list models and the grid
models, and logits/scores/losses/metrics must agree on real nodes to float
tolerance.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from building_gan_tpu.config import NUM_CLASSES
from building_gan_tpu.data import batching, grid as gridlib
from building_gan_tpu.models import (
    GridVoxelGNNDiscriminator,
    GridVoxelGNNGenerator,
    VoxelGNNDiscriminator,
    VoxelGNNGenerator,
)
from building_gan_tpu.train import losses as L
from building_gan_tpu.train import metrics as M

from test_train import tiny_cfg


@pytest.fixture(scope="module")
def grid_cfg(small_cfg):
    return tiny_cfg(small_cfg, GRID_SHAPE=(10, 8, 8), GRID_BATCH=2, GRID_LOCAL_NODES=64, PACK_GRAPHS=2)


def _positions(voxel):
    """(n,3) integer grid positions of a building's voxels."""
    return voxel.location.astype(int)


def test_pack_grid_places_features(synthetic_samples, grid_cfg):
    samples = synthetic_samples[:2]
    gb = gridlib.pack_grid(samples, grid_cfg)
    assert gb.x.shape == (2, 10, 8, 8, 12)
    for b, (local, voxel) in enumerate(samples):
        pos = _positions(voxel)
        np.testing.assert_allclose(gb.x[b, pos[:, 0], pos[:, 1], pos[:, 2]], voxel.x)
        assert gb.mask[b].sum() == voxel.x.shape[0]
        np.testing.assert_array_equal(
            gb.type[b, pos[:, 0], pos[:, 1], pos[:, 2]], voxel.types
        )
        assert np.isclose(gb.far[b], voxel.far)


def test_grid_compatible(synthetic_samples, grid_cfg):
    for local, voxel in synthetic_samples:
        assert gridlib.grid_compatible(voxel, grid_cfg.GRID_SHAPE)
    # breaking an edge breaks compatibility
    local, voxel = synthetic_samples[0]
    import dataclasses

    broken = dataclasses.replace(voxel, edge_index=voxel.edge_index[:, :-1])
    assert not gridlib.grid_compatible(broken, grid_cfg.GRID_SHAPE)


@pytest.mark.parametrize("conv", ["GATCONV", "GCNCONV", "GRAPHCONV", "GATV2CONV"])
def test_generator_grid_vs_edge_parity(synthetic_samples, grid_cfg, conv):
    """Same params, same building, both layouts -> same logits on real nodes."""
    cfg = grid_cfg.replace(GENERATOR_CONV_TYPE=conv)
    samples = synthetic_samples[:2]
    packed = batching.pack_graphs(samples, cfg)[0]
    gb = gridlib.pack_grid(samples, cfg)

    key = jax.random.key(0)
    # strict parity: pin f32 so layout equivalence isn't blurred by bf16
    edge_gen = VoxelGNNGenerator(configuration=cfg, dtype=jnp.float32)
    grid_gen = GridVoxelGNNGenerator(configuration=cfg, dtype=jnp.float32)

    z_packed = jnp.zeros((packed.voxel_x.shape[0], cfg.Z_DIM))
    variables = edge_gen.init({"params": key, "gumbel": key}, packed, z_packed, deterministic=True)

    logits_e, _, _ = edge_gen.apply(
        variables, packed, z_packed, deterministic=True, rngs={"gumbel": key}
    )

    z_grid = jnp.zeros(gb.mask.shape + (cfg.Z_DIM,))
    logits_g, _, _ = grid_gen.apply(
        variables, gb, z_grid, deterministic=True, rngs={"gumbel": key}
    )

    # map packed node order -> grid positions
    offset = 0
    for b, (local, voxel) in enumerate(samples):
        n = voxel.x.shape[0]
        pos = _positions(voxel)
        got = np.array(logits_g[b, pos[:, 0], pos[:, 1], pos[:, 2]])
        want = np.array(logits_e[offset : offset + n])
        # f32 sum-order differences (segment softmax vs stencil, one-pass
        # moments) amplify ~1e-3 over 14 layers; layout bugs would be O(1)
        np.testing.assert_allclose(got, want, rtol=5e-3, atol=1e-3)
        offset += n


def test_discriminator_grid_vs_edge_parity(synthetic_samples, grid_cfg):
    cfg = grid_cfg
    samples = synthetic_samples[:2]
    packed = batching.pack_graphs(samples, cfg)[0]
    gb = gridlib.pack_grid(samples, cfg)

    key = jax.random.key(1)
    edge_disc = VoxelGNNDiscriminator(configuration=cfg, dtype=jnp.float32)
    grid_disc = GridVoxelGNNDiscriminator(configuration=cfg, dtype=jnp.float32)

    label_packed = jax.nn.one_hot(packed.voxel_type, NUM_CLASSES) * packed.voxel_mask[:, None]
    label_grid = jax.nn.one_hot(gb.type, NUM_CLASSES) * gb.mask[..., None]

    variables = edge_disc.init({"params": key}, packed, label_packed, deterministic=True)
    score_e = edge_disc.apply(variables, packed, label_packed, deterministic=True)
    score_g = grid_disc.apply(variables, gb, label_grid, deterministic=True)

    offset = 0
    for b, (local, voxel) in enumerate(samples):
        n = voxel.x.shape[0]
        pos = _positions(voxel)
        got = np.array(score_g[b, pos[:, 0], pos[:, 1], pos[:, 2], 0])
        want = np.array(score_e[offset : offset + n, 0])
        np.testing.assert_allclose(got, want, rtol=5e-3, atol=1e-3)
        offset += n


def test_metrics_grid_vs_packed_parity(synthetic_samples, grid_cfg):
    samples = synthetic_samples[:2]
    packed = batching.pack_graphs(samples, grid_cfg)[0]
    gb = gridlib.pack_grid(samples, grid_cfg)

    rng = np.random.default_rng(0)
    # same per-building predictions in both layouts
    pred_grid = np.array(rng.integers(0, 7, gb.type.shape), dtype=np.int32)
    pred_packed = np.zeros(packed.voxel_type.shape, np.int32)
    offset = 0
    for b, (local, voxel) in enumerate(samples):
        n = voxel.x.shape[0]
        pos = _positions(voxel)
        pred_packed[offset : offset + n] = pred_grid[b, pos[:, 0], pos[:, 1], pos[:, 2]]
        offset += n

    m_packed = M.compute_metrics(
        jnp.array(packed.voxel_type), jnp.array(pred_packed), jnp.array(packed.voxel_mask),
        jnp.array(packed.voxel_graph_id), jnp.array(packed.graph_mask),
    )
    m_grid = M.compute_metrics(
        jnp.array(gb.type), jnp.array(pred_grid), jnp.array(gb.mask),
        None, jnp.array(gb.graph_mask),
    )
    for k in ("f1", "f1_min", "precision", "recall", "accuracy"):
        assert np.isclose(float(m_packed[k]), float(m_grid[k]), atol=1e-5), k


def test_generated_far_grid(synthetic_samples, grid_cfg):
    gb = gridlib.pack_grid(synthetic_samples[:2], grid_cfg)
    onehot = jax.nn.one_hot(gb.type, NUM_CLASSES)
    far_gen = np.array(L.generated_far(gb, onehot))
    np.testing.assert_allclose(far_gen[:2], gb.far[:2], rtol=1e-4)


@pytest.mark.heavy  # full-step CPU compile (>100 s; core tier excludes)
def test_grid_train_step_runs(synthetic_samples, grid_cfg):
    from building_gan_tpu.train.state import create_train_state
    from building_gan_tpu.train.step import make_train_step

    cfg = grid_cfg
    gb = gridlib.pack_grid(synthetic_samples[:2], cfg)
    gen = GridVoxelGNNGenerator(configuration=cfg)
    disc = GridVoxelGNNDiscriminator(configuration=cfg)
    state, tx_g, tx_d = create_train_state(cfg, gen, disc, gb, jax.random.key(0), 10)
    step = jax.jit(make_train_step(cfg, gen, disc, tx_g, tx_d))
    state2, metrics = step(state, gb, jax.random.key(1))
    for k in ("g_loss", "d_loss", "f1", "f1_min", "accuracy"):
        assert np.isfinite(float(metrics[k])), k


@pytest.mark.heavy  # full-step CPU compile (>100 s; core tier excludes)
def test_gp_dtype_f32_step_runs(synthetic_samples, grid_cfg):
    """GP_DTYPE='float32' under bf16 compute: step runs, losses finite,
    and the param pytree is unchanged (the f32 GP critic shares params)."""
    from building_gan_tpu.train.state import create_train_state
    from building_gan_tpu.train.step import make_train_step

    cfg = grid_cfg.replace(COMPUTE_DTYPE="bfloat16", GP_DTYPE="float32", N_CRITIC=1)
    gb = gridlib.pack_grid(synthetic_samples[:2], cfg)
    gen = GridVoxelGNNGenerator(configuration=cfg)
    disc = GridVoxelGNNDiscriminator(configuration=cfg)
    state, tx_g, tx_d = create_train_state(cfg, gen, disc, gb, jax.random.key(0), 10)
    step = jax.jit(make_train_step(cfg, gen, disc, tx_g, tx_d))
    state2, metrics = step(state, gb, jax.random.key(1))
    assert jax.tree_util.tree_structure(state2.params_d) == jax.tree_util.tree_structure(state.params_d)
    for k in ("g_loss", "d_loss", "f1"):
        assert np.isfinite(float(metrics[k])), k


@pytest.mark.heavy  # full-step CPU compile (>100 s; core tier excludes)
def test_remat_hourglass_grad_parity(synthetic_samples, grid_cfg, highest_precision):
    """Fast remat check: generator loss gradients are identical off vs on."""
    import jax.flatten_util  # noqa: F401

    outs = []
    for remat in (False, True):
        cfg = grid_cfg.replace(COMPUTE_DTYPE="float32", REMAT_HOURGLASS=remat)
        gb = gridlib.pack_grid(synthetic_samples[:2], cfg)
        gen = GridVoxelGNNGenerator(configuration=cfg)
        k = jax.random.key(0)
        B = gb.x.shape[0]
        R = int(np.prod(gb.x.shape[1:4]))
        z = jax.random.normal(k, (B, R, cfg.Z_DIM), dtype=jnp.float32)
        params = gen.init({"params": k, "gumbel": k, "dropout": k}, gb, z, deterministic=True)

        def loss(p):
            _, _, soft = gen.apply(p, gb, z, deterministic=False,
                                   rngs={"gumbel": k, "dropout": k})
            return jnp.sum(soft.astype(jnp.float32) ** 2) / 1e3

        outs.append((params, jax.jit(jax.grad(loss))(params)))

    (p_off, g_off), (p_on, g_on) = outs
    assert jax.tree_util.tree_structure(p_off) == jax.tree_util.tree_structure(p_on)
    f_off = jax.flatten_util.ravel_pytree(g_off)[0]
    f_on = jax.flatten_util.ravel_pytree(g_on)[0]
    rel = float(jnp.linalg.norm(f_off - f_on) / (jnp.linalg.norm(f_off) + 1e-12))
    # remat changes fusion boundaries, so bitwise equality is not expected
    # under jit — only rounding-level drift (measured 1.8e-6 on this CPU).
    assert rel < 1e-4, rel


@pytest.mark.slow
def test_remat_hourglass_step_parity(synthetic_samples, grid_cfg, highest_precision):
    """REMAT_HOURGLASS only changes residual policy, never math.

    The remat-wrapped hourglass must produce the SAME param pytree and the
    same post-step state as the plain stack (it recomputes the elementwise
    tail in the backward pass instead of storing it — docs/PERF.md §10).
    """
    import jax.flatten_util  # noqa: F401  (not auto-imported by `import jax`)

    from building_gan_tpu.train.state import create_train_state
    from building_gan_tpu.train.step import make_train_step

    results = []
    for remat in (False, True):
        cfg = grid_cfg.replace(COMPUTE_DTYPE="float32", REMAT_HOURGLASS=remat)
        gb = gridlib.pack_grid(synthetic_samples[:2], cfg)
        gen = GridVoxelGNNGenerator(configuration=cfg)
        disc = GridVoxelGNNDiscriminator(configuration=cfg)
        state, tx_g, tx_d = create_train_state(cfg, gen, disc, gb, jax.random.key(0), 10)
        step = jax.jit(make_train_step(cfg, gen, disc, tx_g, tx_d))
        state2, metrics = step(state, gb, jax.random.key(1))
        results.append((state, state2, metrics))

    (s0_off, s2_off, m_off), (s0_on, s2_on, m_on) = results
    assert jax.tree_util.tree_structure(s0_off.params_g) == jax.tree_util.tree_structure(s0_on.params_g)
    for k in ("g_loss", "d_loss"):
        np.testing.assert_allclose(float(m_off[k]), float(m_on[k]), rtol=3e-3, atol=1e-5)
    flat_off = jax.flatten_util.ravel_pytree((s2_off.params_g, s2_off.params_d))[0]
    flat_on = jax.flatten_util.ravel_pytree((s2_on.params_g, s2_on.params_d))[0]
    rel = float(jnp.linalg.norm(flat_off - flat_on) / (jnp.linalg.norm(flat_off) + 1e-12))
    assert rel < 3e-3, rel


@pytest.mark.heavy  # full-step CPU compile (>100 s; core tier excludes)
def test_transformer_generator(synthetic_samples, grid_cfg):
    """Stretch config: graph-transformer generator trains one step."""
    from building_gan_tpu.models import GridTransformerGenerator, GridVoxelGNNDiscriminator
    from building_gan_tpu.train.state import create_train_state
    from building_gan_tpu.train.step import make_train_step

    cfg = grid_cfg.replace(TRANSFORMER_LAYERS=2, TRANSFORMER_HEADS=2, GENERATOR_ARCH="transformer")
    gb = gridlib.pack_grid(synthetic_samples[:2], cfg)
    gen = GridTransformerGenerator(configuration=cfg)
    disc = GridVoxelGNNDiscriminator(configuration=cfg)
    state, tx_g, tx_d = create_train_state(cfg, gen, disc, gb, jax.random.key(0), 10)
    step = jax.jit(make_train_step(cfg, gen, disc, tx_g, tx_d))
    state2, metrics = step(state, gb, jax.random.key(1))
    for k in ("g_loss", "d_loss", "f1", "accuracy"):
        assert np.isfinite(float(metrics[k])), k


def test_transformer_attention_isolated_across_buildings(synthetic_samples, grid_cfg):
    """A building's logits must not depend on other buildings in the batch."""
    from building_gan_tpu.models import GridTransformerGenerator

    cfg = grid_cfg.replace(TRANSFORMER_LAYERS=2, TRANSFORMER_HEADS=2)
    gb2 = gridlib.pack_grid(synthetic_samples[:2], cfg)
    gb1 = gridlib.pack_grid(synthetic_samples[:1], cfg, batch_slots=2)

    gen = GridTransformerGenerator(configuration=cfg, dtype=jnp.float32)
    key = jax.random.key(0)
    z = jnp.zeros(gb2.mask.shape + (cfg.Z_DIM,))
    variables = gen.init({"params": key, "gumbel": key}, gb2, z, deterministic=True)
    la, _, _ = gen.apply(variables, gb2, z, deterministic=True, rngs={"gumbel": key})
    lb, _, _ = gen.apply(variables, gb1, z, deterministic=True, rngs={"gumbel": key})
    m0 = np.array(gb2.mask[0]) > 0
    np.testing.assert_allclose(
        np.array(la[0])[m0], np.array(lb[0])[m0], rtol=1e-4, atol=1e-5
    )
