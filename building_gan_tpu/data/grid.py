"""Dense-grid batch layout — the TPU fast path for voxel graphs.

Voxel graphs in the Building-GAN data are irregular *grids*: every node has a
unique ``location = (floor, iy, ix)`` and its neighbors are exactly the
face-adjacent occupied cells (reference `data.py:291-335` builds the edge list
from those neighbor triples).  This module lays a batch of buildings out as a
dense block::

    x        (B, F, Y, X, 12)  per-cell features (reference 12-dim layout)
    type     (B, F, Y, X)      program labels
    mask     (B, F, Y, X)      cell occupancy
    dimension(B, F, Y, X, 3)   raw (z, y, x) cell dims (for FAR)

so message passing becomes a 6-point stencil (`ops.stencil`) with zero
gather/scatter.  The local program graph stays a (padded) node list — it is
only ever *pooled by type* (reference `models.py:122-129`), never convolved.

``grid_compatible`` verifies a voxel graph's edge list equals the implied
face adjacency, so the pipeline can route genuinely non-grid graphs to the
edge-list path.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import numpy as np
from flax import struct

from ..config import Configuration
from .preprocess import LocalGraph, VoxelGraph


@struct.dataclass
class GridBatch:
    """Fixed-shape dense batch of up to B buildings on an (F, Y, X) grid."""

    x: np.ndarray  # (B, F, Y, X, 12) f32
    type: np.ndarray  # (B, F, Y, X) i32
    mask: np.ndarray  # (B, F, Y, X) f32
    dimension: np.ndarray  # (B, F, Y, X, 3) f32

    local_x: np.ndarray  # (B, NL, 17) f32
    local_type: np.ndarray  # (B, NL) i32
    local_mask: np.ndarray  # (B, NL) f32

    graph_mask: np.ndarray  # (B,) f32
    far: np.ndarray  # (B,) f32
    site_area: np.ndarray  # (B,) f32

    @property
    def batch_size(self) -> int:
        return self.mask.shape[0]

    @property
    def grid_shape(self) -> Tuple[int, int, int]:
        return self.mask.shape[1:4]


def grid_compatible(voxel: VoxelGraph, grid_shape: Tuple[int, int, int]) -> bool:
    """True iff locations are unique, within shape, and the edge list equals
    the face adjacency of the occupied cells."""
    loc = voxel.location
    F, Y, X = grid_shape
    if loc.shape[0] == 0:
        return False
    if loc.min() < 0 or (loc >= np.array([F, Y, X])).any():
        return False
    keys = set(map(tuple, loc.tolist()))
    if len(keys) != loc.shape[0]:
        return False
    # implied face adjacency
    implied = set()
    index = {tuple(l): i for i, l in enumerate(loc.tolist())}
    for i, l in enumerate(loc.tolist()):
        f, y, x = l
        for df, dy, dx in ((1, 0, 0), (-1, 0, 0), (0, 1, 0), (0, -1, 0), (0, 0, 1), (0, 0, -1)):
            nb = (f + df, y + dy, x + dx)
            if nb in index:
                implied.add((i, index[nb]))
    actual = set(map(tuple, voxel.edge_index.T.tolist()))
    return implied == actual


def pack_grid(
    samples: Sequence[Tuple[LocalGraph, VoxelGraph]],
    cfg: Configuration,
    batch_slots: int | None = None,
) -> GridBatch:
    """Place up to ``batch_slots`` buildings into the dense grid batch."""
    F, Y, X = cfg.GRID_SHAPE
    B = batch_slots if batch_slots is not None else cfg.GRID_BATCH
    NL = cfg.GRID_LOCAL_NODES
    assert len(samples) <= B, f"{len(samples)} samples > {B} slots"

    x = np.zeros((B, F, Y, X, 12), np.float32)
    typ = np.zeros((B, F, Y, X), np.int32)
    mask = np.zeros((B, F, Y, X), np.float32)
    dim = np.zeros((B, F, Y, X, 3), np.float32)
    local_x = np.zeros((B, NL, 17), np.float32)
    local_type = np.zeros((B, NL), np.int32)
    local_mask = np.zeros((B, NL), np.float32)
    graph_mask = np.zeros(B, np.float32)
    far = np.zeros(B, np.float32)
    site_area = np.ones(B, np.float32)

    for b, (local, voxel) in enumerate(samples):
        loc = voxel.location
        assert loc.max(initial=0) < max(F, Y, X) and (loc < np.array([F, Y, X])).all(), (
            f"building {voxel.data_number} exceeds grid shape {cfg.GRID_SHAPE}: "
            f"max location {loc.max(axis=0)}"
        )
        f_, y_, x_ = loc[:, 0], loc[:, 1], loc[:, 2]
        x[b, f_, y_, x_] = voxel.x
        typ[b, f_, y_, x_] = voxel.types
        mask[b, f_, y_, x_] = 1.0
        dim[b, f_, y_, x_] = voxel.dimension

        n = local.x.shape[0]
        assert n <= NL, f"building {local.data_number}: {n} local nodes > {NL}"
        local_x[b, :n] = local.x
        local_type[b, :n] = local.types
        local_mask[b, :n] = 1.0

        graph_mask[b] = 1.0
        far[b] = voxel.far
        site_area[b] = voxel.site_area

    return GridBatch(
        x=x, type=typ, mask=mask, dimension=dim,
        local_x=local_x, local_type=local_type, local_mask=local_mask,
        graph_mask=graph_mask, far=far, site_area=site_area,
    )


def grid_to_node_lists(batch: GridBatch) -> dict:
    """Flatten a GridBatch to node-list views (for parity tests/metrics).

    Returns dict with voxel_type (B*cells,), voxel_mask, graph_id arrays in
    row-major cell order.
    """
    B = batch.batch_size
    cells = int(np.prod(batch.grid_shape))
    return {
        "voxel_type": np.asarray(batch.type).reshape(B * cells),
        "voxel_mask": np.asarray(batch.mask).reshape(B * cells),
        "graph_id": np.repeat(np.arange(B, dtype=np.int32), cells),
    }


def stack_grid_batches(batches: Sequence[GridBatch]) -> GridBatch:
    """Stack on a new leading device axis for data parallelism."""
    import jax

    return jax.tree.map(lambda *xs: np.stack(xs, axis=0), *batches)
