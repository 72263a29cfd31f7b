"""Multi-building-per-slot packing tests (data/grid.py pack_grid_multi).

The 3D first-fit bin packer places several buildings into one grid slot —
either with a guaranteed 1-cell gap ("bbox_gap" mode) or gap-free on their
actual cells ("cell" mode, buildings may touch; gid-aware stencils keep them
isolated) — tagging cells with per-slot graph ids.  Everything per-graph
(GraphNorm stats, type-matched pooling, FAR, per-graph F1, and the stencil
message passing itself) must be EXACTLY as if each building had its own slot
— these tests pin that equivalence against the single-building packer, in
BOTH modes.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from building_gan_tpu.config import NUM_CLASSES
from building_gan_tpu.data import grid as gridlib
from building_gan_tpu.models import GridVoxelGNNDiscriminator, GridVoxelGNNGenerator
from building_gan_tpu.train import losses as L
from building_gan_tpu.train import metrics as M

from test_train import tiny_cfg


@pytest.fixture(scope="module")
def multi_cfg(small_cfg):
    return tiny_cfg(
        small_cfg,
        GRID_SHAPE=(11, 12, 12),
        GRID_BATCH=1,
        GRID_LOCAL_NODES=256,
        GRID_SLOT_GRAPHS=4,
        PACK_GRAPHS=4,
    )


@pytest.mark.parametrize("mode", ["bbox_gap", "cell"])
def test_pack_grid_multi_places(synthetic_samples, multi_cfg, mode):
    samples = synthetic_samples[:4]
    cfg = multi_cfg.replace(GRID_PACK_MODE=mode)
    gb = gridlib.pack_grid_multi(samples, cfg)
    assert gb.graphs_per_slot == 4
    assert gb.mask.shape == (1, 11, 12, 12)
    # every building fully placed exactly once (no overlap in either mode)
    total = sum(v.x.shape[0] for _, v in samples)
    assert int(gb.mask.sum()) == total
    assert float(gb.graph_mask.sum()) == len(samples)

    if mode == "bbox_gap":
        # no two cells of DIFFERENT buildings are face-adjacent (1-cell gap)
        mask = np.array(gb.mask[0]) > 0
        gid = np.array(gb.gid[0])
        gid_occ = np.where(mask, gid, -1)
        for axis in range(3):
            a = np.moveaxis(gid_occ, axis, 0)
            left, right = a[:-1], a[1:]
            both = (left >= 0) & (right >= 0)
            assert np.all(left[both] == right[both]), f"axis {axis}: cross-building contact"


def test_cell_mode_packs_tighter(synthetic_samples, multi_cfg):
    """Gap-free cell packing never uses more slots than bbox_gap packing."""
    cfg = multi_cfg.replace(GRID_SLOT_GRAPHS=8, GRID_LOCAL_NODES=512)
    n_gap = len(gridlib.plan_packing(synthetic_samples, cfg.replace(GRID_PACK_MODE="bbox_gap")))
    n_cell = len(gridlib.plan_packing(synthetic_samples, cfg.replace(GRID_PACK_MODE="cell")))
    assert n_cell <= n_gap


@pytest.mark.parametrize("mode", ["bbox_gap", "cell"])
def test_multi_vs_single_slot_generator_parity(synthetic_samples, multi_cfg, mode):
    """Same params: K buildings in ONE slot == each building in its own slot.

    In "cell" mode buildings may be FACE-ADJACENT in the packed slot; parity
    then proves the gid-aware stencils pass no messages across buildings."""
    cfg = multi_cfg.replace(GRID_PACK_MODE=mode)
    samples = synthetic_samples[:4]
    gb_multi = gridlib.pack_grid_multi(samples, cfg)
    cfg_single = cfg.replace(GRID_SLOT_GRAPHS=1, GRID_BATCH=4)
    gb_single = gridlib.pack_grid(samples, cfg_single)

    key = jax.random.key(0)
    gen = GridVoxelGNNGenerator(configuration=cfg, dtype=jnp.float32)
    z_m = jnp.zeros(gb_multi.mask.shape + (cfg.Z_DIM,))
    z_s = jnp.zeros(gb_single.mask.shape + (cfg.Z_DIM,))
    variables = gen.init({"params": key, "gumbel": key}, gb_multi, z_m, deterministic=True)
    lm, _, _ = gen.apply(variables, gb_multi, z_m, deterministic=True, rngs={"gumbel": key})
    ls, _, _ = gen.apply(variables, gb_single, z_s, deterministic=True, rngs={"gumbel": key})

    # compare per-building via original voxel locations
    placed = {}  # sample index -> offset, from the packer's plan
    slots = gridlib._first_fit_decreasing(
        samples, cfg.GRID_SHAPE, cfg.GRID_SLOT_GRAPHS,
        local_budget=cfg.GRID_LOCAL_NODES, mode=cfg.GRID_PACK_MODE,
    )
    for slot in slots:
        for i, off in slot.placed:
            placed[i] = off
    assert len(slots) == 1 and len(placed) == 4
    for b, (local, voxel) in enumerate(samples):
        pos = voxel.location.astype(int)
        f0, y0, x0 = placed[b]
        got = np.array(lm[0, pos[:, 0] + f0, pos[:, 1] + y0, pos[:, 2] + x0])
        want = np.array(ls[b, pos[:, 0], pos[:, 1], pos[:, 2]])
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


@pytest.mark.parametrize("mode", ["bbox_gap", "cell"])
def test_multi_vs_single_slot_discriminator_parity(synthetic_samples, multi_cfg, mode):
    cfg = multi_cfg.replace(GRID_PACK_MODE=mode)
    samples = synthetic_samples[:4]
    gb_multi = gridlib.pack_grid_multi(samples, cfg)
    gb_single = gridlib.pack_grid(samples, cfg.replace(GRID_SLOT_GRAPHS=1, GRID_BATCH=4))

    key = jax.random.key(1)
    disc = GridVoxelGNNDiscriminator(configuration=cfg, dtype=jnp.float32)
    lab_m = jax.nn.one_hot(gb_multi.type, NUM_CLASSES) * gb_multi.mask[..., None]
    lab_s = jax.nn.one_hot(gb_single.type, NUM_CLASSES) * gb_single.mask[..., None]
    variables = disc.init({"params": key}, gb_multi, lab_m, deterministic=True)
    sm = disc.apply(variables, gb_multi, lab_m, deterministic=True)
    ss = disc.apply(variables, gb_single, lab_s, deterministic=True)

    slots = gridlib._first_fit_decreasing(
        samples, cfg.GRID_SHAPE, cfg.GRID_SLOT_GRAPHS,
        local_budget=cfg.GRID_LOCAL_NODES, mode=cfg.GRID_PACK_MODE,
    )
    placed = {i: off for slot in slots for i, off in slot.placed}
    for b, (local, voxel) in enumerate(samples):
        pos = voxel.location.astype(int)
        f0, y0, x0 = placed[b]
        got = np.array(sm[0, pos[:, 0] + f0, pos[:, 1] + y0, pos[:, 2] + x0, 0])
        want = np.array(ss[b, pos[:, 0], pos[:, 1], pos[:, 2], 0])
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_multi_metrics_parity(synthetic_samples, multi_cfg):
    """Per-graph confusion matrices keyed on gid match per-slot packing."""
    cfg = multi_cfg
    samples = synthetic_samples[:4]
    gb_m = gridlib.pack_grid_multi(samples, cfg)
    gb_s = gridlib.pack_grid(samples, cfg.replace(GRID_SLOT_GRAPHS=1, GRID_BATCH=4))

    rng = np.random.default_rng(0)
    pred_s = np.array(rng.integers(0, 7, gb_s.type.shape), dtype=np.int32)
    # mirror predictions into the multi layout
    slots = gridlib._first_fit_decreasing(
        samples, cfg.GRID_SHAPE, cfg.GRID_SLOT_GRAPHS,
        local_budget=cfg.GRID_LOCAL_NODES, mode=cfg.GRID_PACK_MODE,
    )
    placed = {i: off for slot in slots for i, off in slot.placed}
    pred_m = np.zeros(gb_m.type.shape, np.int32)
    for b, (local, voxel) in enumerate(samples):
        pos = voxel.location.astype(int)
        f0, y0, x0 = placed[b]
        pred_m[0, pos[:, 0] + f0, pos[:, 1] + y0, pos[:, 2] + x0] = pred_s[
            b, pos[:, 0], pos[:, 1], pos[:, 2]
        ]

    m_s = M.compute_metrics(
        jnp.array(gb_s.type), jnp.array(pred_s), jnp.array(gb_s.mask),
        None, jnp.array(gb_s.graph_mask),
    )
    m_m = M.compute_metrics(
        jnp.array(gb_m.type), jnp.array(pred_m), jnp.array(gb_m.mask),
        None, jnp.array(gb_m.graph_mask),
        gid=jnp.array(gb_m.gid), num_graphs_per_slot=gb_m.graphs_per_slot,
    )
    for k in ("f1", "f1_min", "precision", "recall", "accuracy"):
        assert np.isclose(float(m_s[k]), float(m_m[k]), atol=1e-5), k


def test_generated_far_multi(synthetic_samples, multi_cfg):
    gb = gridlib.pack_grid_multi(synthetic_samples[:4], multi_cfg)
    onehot = jax.nn.one_hot(gb.type, NUM_CLASSES)
    far_gen = np.array(L.generated_far(gb, onehot))  # (B, K)
    assert far_gen.shape == gb.far.shape
    real = np.array(gb.graph_mask) > 0
    np.testing.assert_allclose(far_gen[real], np.array(gb.far)[real], rtol=1e-4)


def test_plan_packing_covers_all(synthetic_samples, multi_cfg):
    plan = gridlib.plan_packing(synthetic_samples, multi_cfg)
    seen = sorted(i for slot in plan for i in slot)
    assert seen == list(range(len(synthetic_samples)))
    assert all(len(slot) <= multi_cfg.GRID_SLOT_GRAPHS for slot in plan)
    # packing multiple buildings per slot must use fewer slots than one-per
    assert len(plan) < len(synthetic_samples)


def test_multi_train_step_runs(synthetic_samples, multi_cfg):
    from building_gan_tpu.train.state import create_train_state
    from building_gan_tpu.train.step import make_train_step

    cfg = multi_cfg.replace(GRID_BATCH=2)
    gb = gridlib.pack_grid_multi(synthetic_samples[:6], cfg)
    gen = GridVoxelGNNGenerator(configuration=cfg)
    disc = GridVoxelGNNDiscriminator(configuration=cfg)
    state, tx_g, tx_d = create_train_state(cfg, gen, disc, gb, jax.random.key(0), 10)
    from building_gan_tpu.train.step import make_train_step as _mts

    step = jax.jit(_mts(cfg, gen, disc, tx_g, tx_d))
    state2, metrics = step(state, gb, jax.random.key(1))
    for k in ("g_loss", "d_loss", "f1", "f1_min", "accuracy"):
        assert np.isfinite(float(metrics[k])), k


def test_loader_multipack_covers_all(synthetic_samples, multi_cfg):
    """PackedLoader with GRID_SLOT_GRAPHS>1 bin-packs every building exactly
    once per epoch into fixed-shape multi-building batches."""
    from building_gan_tpu.data.pipeline import PackedLoader

    cfg = multi_cfg.replace(LAYOUT="grid", GRID_BATCH=2)
    loader = PackedLoader(synthetic_samples, cfg, shuffle=True, seed=0)
    for _ in range(2):  # reshuffled epochs keep the invariant
        total_graphs = 0
        total_nodes = 0
        for gb in loader:
            assert gb.mask.shape[0] == 2
            assert gb.graphs_per_slot == cfg.GRID_SLOT_GRAPHS
            total_graphs += int(gb.graph_mask.sum())
            total_nodes += int(gb.mask.sum())
        assert total_graphs == len(synthetic_samples)
        assert total_nodes == sum(v.x.shape[0] for _, v in synthetic_samples)
