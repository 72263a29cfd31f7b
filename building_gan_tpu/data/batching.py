"""Static-shape bucket-padded batching for irregular building graphs.

The reference merges a list of graphs with PyG ``Batch.from_data_list``
(`building_gan/src/data.py:156-163`), producing dynamic shapes per batch.  XLA
compiles one program per shape, so here graphs are *packed* into fixed-budget
containers: every batch holds up to ``PACK_GRAPHS`` buildings, padded to
exactly ``PACK_LOCAL_NODES`` / ``PACK_VOXEL_NODES`` nodes and
``PACK_LOCAL_EDGES`` / ``PACK_VOXEL_EDGES`` edges.  A jitted train step
therefore sees one shape for the whole run.

Padding conventions (consumed by `building_gan_tpu.ops`):
- padded **nodes** carry ``graph_id == PACK_GRAPHS`` (a dummy segment) and
  ``mask == 0``;
- padded **edges** point at node 0 with ``edge_mask == 0``;
- edges are sorted by destination so segment ops (and the Pallas kernel) see
  contiguous destination runs.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np
from flax import struct

from ..config import Configuration
from .preprocess import LocalGraph, VoxelGraph


@struct.dataclass
class PackedBatch:
    """One fixed-shape pack of up to G buildings.  All arrays are padded."""

    # local program graph (node features: 17 dims, reference data.py:24-33)
    local_x: np.ndarray  # (NL, 17) f32
    local_type: np.ndarray  # (NL,) i32
    local_graph_id: np.ndarray  # (NL,) i32; padded -> G
    local_mask: np.ndarray  # (NL,) f32
    local_src: np.ndarray  # (EL,) i32
    local_dst: np.ndarray  # (EL,) i32
    local_edge_mask: np.ndarray  # (EL,) f32

    # voxel graph (node features: 12 dims, reference data.py:56-64)
    voxel_x: np.ndarray  # (NV, 12) f32
    voxel_type: np.ndarray  # (NV,) i32
    voxel_graph_id: np.ndarray  # (NV,) i32; padded -> G
    voxel_mask: np.ndarray  # (NV,) f32
    voxel_src: np.ndarray  # (EV,) i32
    voxel_dst: np.ndarray  # (EV,) i32
    voxel_edge_mask: np.ndarray  # (EV,) f32
    voxel_dimension: np.ndarray  # (NV, 3) f32 — raw (z, y, x) dims for FAR

    # per-graph scalars
    graph_mask: np.ndarray  # (G,) f32
    far: np.ndarray  # (G,) f32
    site_area: np.ndarray  # (G,) f32

    @property
    def num_graph_slots(self) -> int:
        return self.graph_mask.shape[0]

    @property
    def num_voxel_slots(self) -> int:
        return self.voxel_mask.shape[0]


def _fits(
    counts: Tuple[int, int, int, int, int], budgets: Tuple[int, int, int, int, int]
) -> bool:
    return all(c <= b for c, b in zip(counts, budgets))


def pack_graphs(
    samples: Sequence[Tuple[LocalGraph, VoxelGraph]],
    cfg: Configuration,
    drop_overflow: bool = False,
) -> List[PackedBatch]:
    """Greedily pack samples into fixed-budget batches (first-fit order).

    Raises if a single building exceeds the budgets, unless ``drop_overflow``.
    """
    budgets = (
        cfg.PACK_GRAPHS,
        cfg.PACK_LOCAL_NODES,
        cfg.PACK_LOCAL_EDGES,
        cfg.PACK_VOXEL_NODES,
        cfg.PACK_VOXEL_EDGES,
    )
    packs: List[List[Tuple[LocalGraph, VoxelGraph]]] = []
    cur: List[Tuple[LocalGraph, VoxelGraph]] = []
    cur_counts = (0, 0, 0, 0, 0)
    for local, voxel in samples:
        need = (
            1,
            local.x.shape[0],
            local.edge_index.shape[1],
            voxel.x.shape[0],
            voxel.edge_index.shape[1],
        )
        if not _fits(need, budgets):
            if drop_overflow:
                continue
            raise ValueError(
                f"building {voxel.data_number} exceeds pack budgets: need={need}, budgets={budgets}"
            )
        new_counts = tuple(c + n for c, n in zip(cur_counts, need))
        if _fits(new_counts, budgets):
            cur.append((local, voxel))
            cur_counts = new_counts
        else:
            packs.append(cur)
            cur = [(local, voxel)]
            cur_counts = need
    if cur:
        packs.append(cur)
    return [pack_one(p, cfg) for p in packs]


def pack_one(samples: Sequence[Tuple[LocalGraph, VoxelGraph]], cfg: Configuration) -> PackedBatch:
    """Materialize one PackedBatch from a list of (local, voxel) samples."""
    G = cfg.PACK_GRAPHS
    NL, EL = cfg.PACK_LOCAL_NODES, cfg.PACK_LOCAL_EDGES
    NV, EV = cfg.PACK_VOXEL_NODES, cfg.PACK_VOXEL_EDGES
    assert len(samples) <= G

    local_x = np.zeros((NL, samples[0][0].x.shape[1]), dtype=np.float32)
    local_type = np.zeros(NL, dtype=np.int32)
    local_graph_id = np.full(NL, G, dtype=np.int32)
    local_mask = np.zeros(NL, dtype=np.float32)
    local_edges = []  # (src, dst) with offsets applied

    voxel_x = np.zeros((NV, samples[0][1].x.shape[1]), dtype=np.float32)
    voxel_type = np.zeros(NV, dtype=np.int32)
    voxel_graph_id = np.full(NV, G, dtype=np.int32)
    voxel_mask = np.zeros(NV, dtype=np.float32)
    voxel_dimension = np.zeros((NV, 3), dtype=np.float32)
    voxel_edges = []

    graph_mask = np.zeros(G, dtype=np.float32)
    far = np.zeros(G, dtype=np.float32)
    site_area = np.ones(G, dtype=np.float32)  # 1 avoids div-by-zero on padding

    nl = nv = 0
    for gi, (local, voxel) in enumerate(samples):
        n = local.x.shape[0]
        local_x[nl : nl + n] = local.x
        local_type[nl : nl + n] = local.types
        local_graph_id[nl : nl + n] = gi
        local_mask[nl : nl + n] = 1.0
        if local.edge_index.shape[1]:
            local_edges.append(local.edge_index + nl)
        nl += n

        m = voxel.x.shape[0]
        voxel_x[nv : nv + m] = voxel.x
        voxel_type[nv : nv + m] = voxel.types
        voxel_graph_id[nv : nv + m] = gi
        voxel_mask[nv : nv + m] = 1.0
        voxel_dimension[nv : nv + m] = voxel.dimension
        if voxel.edge_index.shape[1]:
            voxel_edges.append(voxel.edge_index + nv)
        nv += m

        graph_mask[gi] = 1.0
        far[gi] = voxel.far
        site_area[gi] = voxel.site_area

    def _pad_edges(edges: List[np.ndarray], budget: int) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        if edges:
            e = np.concatenate(edges, axis=1)
        else:
            e = np.zeros((2, 0), dtype=np.int32)
        # sort by destination for contiguous segment runs
        order = np.argsort(e[1], kind="stable")
        e = e[:, order]
        ne = e.shape[1]
        src = np.zeros(budget, dtype=np.int32)
        dst = np.zeros(budget, dtype=np.int32)
        mask = np.zeros(budget, dtype=np.float32)
        src[:ne] = e[0]
        dst[:ne] = e[1]
        mask[:ne] = 1.0
        return src, dst, mask

    l_src, l_dst, l_emask = _pad_edges(local_edges, EL)
    v_src, v_dst, v_emask = _pad_edges(voxel_edges, EV)

    return PackedBatch(
        local_x=local_x,
        local_type=local_type,
        local_graph_id=local_graph_id,
        local_mask=local_mask,
        local_src=l_src,
        local_dst=l_dst,
        local_edge_mask=l_emask,
        voxel_x=voxel_x,
        voxel_type=voxel_type,
        voxel_graph_id=voxel_graph_id,
        voxel_mask=voxel_mask,
        voxel_src=v_src,
        voxel_dst=v_dst,
        voxel_edge_mask=v_emask,
        voxel_dimension=voxel_dimension,
        graph_mask=graph_mask,
        far=far,
        site_area=site_area,
    )


def stack_packs(packs: Sequence[PackedBatch]) -> PackedBatch:
    """Stack packs on a new leading axis (the data-parallel shard axis)."""
    import jax

    return jax.tree.map(lambda *xs: np.stack(xs, axis=0), *packs)
