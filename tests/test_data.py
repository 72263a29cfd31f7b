"""Tests for synthetic generation, preprocessing semantics, and packing.

Golden semantics from the reference preprocessor
(`building_gan/src/data.py:216-391`): 17-dim local features, 12-dim voxel
features, normalization constants, VOID remap, FAR invariant, edge symmetry.
"""

import numpy as np
import pytest

from building_gan_tpu.config import Configuration, NUM_CLASSES, VOID
from building_gan_tpu.data import batching, preprocess, synthetic


def test_feature_dims(synthetic_samples):
    for local, voxel in synthetic_samples:
        assert local.x.shape[1] == 17  # reference data.py:24-33
        assert voxel.x.shape[1] == 12  # reference data.py:56-64


def test_local_feature_layout(synthetic_samples, small_cfg):
    local, voxel = synthetic_samples[0]
    n = local.x.shape[0]
    onehot = local.x[:, :7]
    assert np.allclose(onehot.sum(axis=1), 1.0)
    assert np.array_equal(onehot.argmax(axis=1), local.types)
    # cols 7:14 = onehot * global type ratio -> row sums equal per-type ratio
    ratio = local.x[:, 7:14]
    assert np.all(ratio[onehot == 0] == 0)
    # far / floor / site_area columns constant or normalized
    assert np.allclose(local.x[:, 14], local.far)
    assert np.allclose(local.x[:, 15], local.floor_levels / small_cfg.NORMALIZATION_FACTOR_FLOOR_LEVEL)
    assert np.allclose(local.x[:, 16], local.site_area / small_cfg.NORMALIZATION_FACTOR_SITE)


def test_voxel_feature_layout(synthetic_samples, small_cfg):
    local, voxel = synthetic_samples[0]
    assert np.allclose(voxel.x[:, 0:3], voxel.coordinate / small_cfg.NORMALIZATION_FACTOR_COORDINATE)
    assert np.allclose(voxel.x[:, 3:6], voxel.dimension / small_cfg.NORMALIZATION_FACTOR_DIMENSION)
    assert np.allclose(voxel.x[:, 6:9], voxel.location / small_cfg.NORMALIZATION_FACTOR_LOCATION)
    assert np.allclose(voxel.x[:, 9], voxel.far)
    assert np.allclose(voxel.x[:, 10], voxel.floor_levels / small_cfg.NORMALIZATION_FACTOR_FLOOR_LEVEL)
    assert np.allclose(voxel.x[:, 11], voxel.site_area / small_cfg.NORMALIZATION_FACTOR_SITE)


def test_far_invariant(synthetic_samples):
    """FAR == GFA / site_area over non-void voxels (reference analyze.py:76-79)."""
    for local, voxel in synthetic_samples:
        nonvoid = voxel.types != VOID
        gfa = (voxel.dimension[nonvoid, 1] * voxel.dimension[nonvoid, 2]).sum()
        assert abs(voxel.far - gfa / voxel.site_area) < 1e-4


def test_edges_symmetric_and_sorted(synthetic_samples):
    for local, voxel in synthetic_samples:
        for g in (local, voxel):
            e = g.edge_index
            pairs = set(map(tuple, e.T.tolist()))
            assert all((b, a) in pairs for a, b in pairs), "adjacency must be symmetric"
            # reference nonzero() order: sorted by (src, dst)
            order = np.lexsort((e[1], e[0]))
            assert np.array_equal(order, np.arange(e.shape[1]))


def test_void_old_remap(small_cfg):
    g, l, v = synthetic.generate_building(seed=5)
    for node in v["voxel_node"]:
        if node["type"] == VOID:
            node["type"] = -1  # legacy encoding
    local, voxel = preprocess.process_building(g, l, v, small_cfg, "000005")
    assert voxel.types.max() < NUM_CLASSES
    assert np.all(voxel.types >= 0)
    assert (voxel.types == VOID).any()


def test_node_ratio(synthetic_samples):
    """node_ratio = ratio of the node's own type (reference data.py:76-77)."""
    local, voxel = synthetic_samples[0]
    n = voxel.types.shape[0]
    counts = np.bincount(voxel.types, minlength=NUM_CLASSES) / n
    assert np.allclose(voxel.node_ratio[:, 0], counts[voxel.types], atol=1e-6)


def test_npz_roundtrip(tmp_path, synthetic_samples):
    local, voxel = synthetic_samples[0]
    lp, vp = str(tmp_path / "l.npz"), str(tmp_path / "v.npz")
    preprocess.save_local(lp, local)
    preprocess.save_voxel(vp, voxel)
    l2 = preprocess.load_local(lp)
    v2 = preprocess.load_voxel(vp)
    assert np.array_equal(l2.x, local.x)
    assert np.array_equal(v2.edge_index, voxel.edge_index)
    assert l2.data_number == local.data_number


def test_packing_budgets_and_masks(synthetic_samples, small_cfg):
    packs = batching.pack_graphs(synthetic_samples, small_cfg)
    assert len(packs) >= 2  # 8 graphs, 4 per pack
    total_nodes = 0
    for p in packs:
        G = small_cfg.PACK_GRAPHS
        assert p.voxel_x.shape == (small_cfg.PACK_VOXEL_NODES, 12)
        assert p.local_x.shape == (small_cfg.PACK_LOCAL_NODES, 17)
        # padded nodes live in the dummy segment G
        assert np.all(p.voxel_graph_id[p.voxel_mask == 0] == G)
        assert np.all(p.voxel_graph_id[p.voxel_mask == 1] < G)
        # padded edges are masked and point at node 0
        assert np.all(p.voxel_src[p.voxel_edge_mask == 0] == 0)
        # edges sorted by destination
        real = p.voxel_edge_mask == 1
        assert np.all(np.diff(p.voxel_dst[real]) >= 0)
        total_nodes += int(p.voxel_mask.sum())
    assert total_nodes == sum(v.x.shape[0] for _, v in synthetic_samples)


def test_pack_preserves_per_graph_content(synthetic_samples, small_cfg):
    packs = batching.pack_graphs(synthetic_samples[:2], small_cfg)
    p = packs[0]
    local0, voxel0 = synthetic_samples[0]
    sel = p.voxel_graph_id == 0
    assert sel.sum() == voxel0.x.shape[0]
    assert np.allclose(p.voxel_x[sel], voxel0.x)
    assert np.array_equal(p.voxel_type[sel], voxel0.types)
    assert np.isclose(p.far[0], voxel0.far)


def test_oversize_building_raises(small_cfg):
    cfg = small_cfg.replace(PACK_VOXEL_NODES=8)
    g, l, v = synthetic.generate_building(seed=0)
    local, voxel = preprocess.process_building(g, l, v, cfg, "0")
    with pytest.raises(ValueError):
        batching.pack_graphs([(local, voxel)], cfg)


def test_create_dataset_end_to_end(tmp_path, small_cfg):
    root = str(tmp_path / "raw")
    synthetic.write_dataset(root, num_buildings=3, seed=1)
    cfg = small_cfg.replace(
        DATA_PATH=root, SAVE_DATA_PATH=str(tmp_path / "processed")
    )
    n = preprocess.create_dataset(cfg, verbose=False)
    assert n == 3
    import os

    files = sorted(os.listdir(cfg.SAVE_DATA_PATH))
    assert len(files) == 6  # 3 local + 3 voxel
    local = preprocess.load_local(os.path.join(cfg.SAVE_DATA_PATH, "000001_local.npz"))
    assert local.x.shape[1] == 17


def test_device_resident_loader_freezes_composition(synthetic_samples, small_cfg):
    """DEVICE_RESIDENT_DATA: packs once, reuses device batches, reshuffles
    only the batch order across epochs (mitigation for the tunneled
    backend's per-transfer host-RAM leak — config.py DEVICE_RESIDENT_DATA)."""
    import jax

    from building_gan_tpu.data.pipeline import PackedLoader

    cfg = small_cfg.replace(
        LAYOUT="grid",
        GRID_SHAPE=(10, 8, 8),
        GRID_BATCH=2,
        GRID_LOCAL_NODES=64,
        PACK_GRAPHS=2,
        DEVICE_RESIDENT_DATA=True,
    )
    loader = PackedLoader(synthetic_samples, cfg, shuffle=True, seed=3)
    ep1 = list(loader)
    ep2 = list(loader)
    assert len(ep1) == len(ep2) == loader.num_packs_per_epoch()
    # same batch OBJECTS both epochs (no repack, no re-transfer) ...
    assert {id(b) for b in ep1} == {id(b) for b in ep2}
    # ... living on device
    assert all(isinstance(b.x, jax.Array) for b in ep1)
    # and the order reshuffles eventually (3 epochs: astronomically unlikely
    # to all match for >= 4 batches under a working shuffle)
    orders = [tuple(id(b) for b in ep1), tuple(id(b) for b in ep2),
              tuple(id(b) for b in loader)]
    assert len(set(orders)) > 1
    # host mode unchanged: fresh packs every epoch
    host = PackedLoader(
        synthetic_samples, cfg.replace(DEVICE_RESIDENT_DATA=False), shuffle=True
    )
    h1 = list(host)
    assert {id(b) for b in h1}.isdisjoint({id(b) for b in host})


def test_device_resident_compositions_cycle(synthetic_samples, small_cfg):
    """DEVICE_RESIDENT_COMPOSITIONS=P pre-packs P distinct compositions and
    cycles one per epoch (period P), approximating the reference's per-epoch
    composition reshuffle (data.py:177-210) at zero steady-state transfers."""
    from building_gan_tpu.data.pipeline import PackedLoader

    cfg = small_cfg.replace(
        LAYOUT="grid",
        GRID_SHAPE=(10, 8, 8),
        GRID_BATCH=2,
        GRID_LOCAL_NODES=64,
        PACK_GRAPHS=2,
        DEVICE_RESIDENT_DATA=True,
        DEVICE_RESIDENT_COMPOSITIONS=2,
    )
    loader = PackedLoader(synthetic_samples, cfg, shuffle=True, seed=3)
    eps = [list(loader) for _ in range(4)]
    ids = [{id(b) for b in ep} for ep in eps]
    # period 2: epoch 0/2 share one composition's batch objects, 1/3 the other
    assert ids[0] == ids[2] and ids[1] == ids[3]
    # distinct compositions are distinct device objects
    assert ids[0].isdisjoint(ids[1])
    # every epoch is a full pass over the dataset
    assert {len(ep) for ep in eps} == {loader.num_packs_per_epoch()}


def test_buckets_compose_with_multipack(synthetic_samples, small_cfg):
    """GRID_BUCKETS + GRID_SLOT_GRAPHS > 1 (VERDICT r3 weak #4): each bucket's
    group bin-packs into slots of ITS shape; every building places exactly
    once and batches carry the multipack gid planes."""
    from building_gan_tpu.data.pipeline import PackedLoader

    cfg = small_cfg.replace(
        LAYOUT="grid",
        GRID_SHAPE=(10, 8, 8),
        GRID_BUCKETS=((6, 6, 6), (10, 8, 8)),
        GRID_SLOT_GRAPHS=2,
        GRID_BATCH=2,
        GRID_LOCAL_NODES=128,
        PACK_GRAPHS=2,
    )
    loader = PackedLoader(synthetic_samples, cfg, shuffle=False, seed=0)
    batches = list(loader)
    assert batches, "no batches produced"
    shapes = {tuple(b.mask.shape[1:]) for b in batches}
    assert shapes <= set(cfg.GRID_BUCKETS), shapes
    # every building placed exactly once across the epoch
    placed = sum(float(b.graph_mask.sum()) for b in batches)
    assert placed == len(synthetic_samples)
    # multipack container: gid planes present and consistent with the mask
    import numpy as np

    for b in batches:
        assert b.gid is not None
        assert b.graph_mask.ndim == 2  # (B, K)
        # cells only carry gid where the mask is on
        assert np.all((b.gid > 0) <= (b.mask > 0))
    # composition actually multipacks somewhere: at least one slot holds 2
    assert any(float(b.graph_mask[:, 1:].sum()) > 0 for b in batches)
