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
    """Fixed-shape dense batch of buildings on an (F, Y, X) grid.

    Two packing regimes share this container:

    - one building per slot (``pack_grid``): ``gid``/``local_gid`` are None
      and the graph-level fields (``graph_mask``/``far``/``site_area``) are
      (B,) — the slot axis IS the graph axis;
    - multiple buildings per slot (``pack_grid_multi`` — 3D bin packing,
      gap-free "cell" mode or 1-cell-gap "bbox_gap" mode per
      ``GRID_PACK_MODE``): ``gid`` is a per-cell local graph index in [0, K),
      ``local_gid`` tags each local program node with its building, and the
      graph-level fields are (B, K).  Per-graph reductions (GraphNorm,
      type-matched pooling, FAR, per-graph F1) key on (slot, gid) via one-hot
      matmuls — still zero gathers.
    """

    x: np.ndarray  # (B, F, Y, X, 12) f32
    type: np.ndarray  # (B, F, Y, X) i32
    mask: np.ndarray  # (B, F, Y, X) f32
    dimension: np.ndarray  # (B, F, Y, X, 3) f32

    local_x: np.ndarray  # (B, NL, 17) f32
    local_type: np.ndarray  # (B, NL) i32
    local_mask: np.ndarray  # (B, NL) f32

    graph_mask: np.ndarray  # (B,) f32  — or (B, K) when multi-packed
    far: np.ndarray  # (B,) f32  — or (B, K)
    site_area: np.ndarray  # (B,) f32  — or (B, K)

    gid: np.ndarray | None = None  # (B, F, Y, X) i32 local graph index
    local_gid: np.ndarray | None = None  # (B, NL) i32

    @property
    def batch_size(self) -> int:
        return self.mask.shape[0]

    @property
    def grid_shape(self) -> Tuple[int, int, int]:
        return self.mask.shape[1:4]

    @property
    def graphs_per_slot(self) -> int:
        """K: max buildings per grid slot (1 in single-building packing)."""
        return 1 if self.gid is None else self.graph_mask.shape[1]


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


class _Slot:
    """One grid slot being filled by the 3D first-fit packer.

    Two packing modes (``Configuration.GRID_PACK_MODE``):

    - ``"bbox_gap"``: occupancy is tracked on a grid padded by 1 on the
      positive faces; each placement reserves its bounding box plus a 1-cell
      margin on the +f/+y/+x sides, guaranteeing >=1 empty cell between any
      two buildings — required when stencils derive neighbor validity from
      the mask alone.
    - ``"cell"``: occupancy is the buildings' ACTUAL cells, no margin —
      buildings may touch (and interpenetrate each other's bounding boxes).
      Safe because the stencils/kernels are gid-aware (a face between two
      different gids is not an edge, `ops/stencil.py`).  On the reference-
      statistics workload this lifts fill 63% -> ~79%, a direct HBM-bytes
      win for the bandwidth-bound train step (docs/PERF.md §4 lever 1).
    """

    def __init__(self, shape: Tuple[int, int, int], mode: str = "bbox_gap"):
        self.shape = shape
        self.mode = mode
        if mode == "cell":
            self.occ = np.zeros(shape, bool)
        else:
            self.occ = np.zeros((shape[0] + 1, shape[1] + 1, shape[2] + 1), bool)
        self.placed: list = []  # (sample index, offset (f0,y0,x0))
        self.local_used = 0  # program-graph nodes consumed in this slot

    def try_place_cells(self, pat: np.ndarray) -> Tuple[int, int, int] | None:
        """First anchor where the building's actual cells hit no occupied cell."""
        F, Y, X = self.shape
        pf, py, px = pat.shape
        if pf > F or py > Y or px > X:
            return None
        win = np.lib.stride_tricks.sliding_window_view(self.occ, pat.shape)
        conflicts = np.einsum(
            "abcijk,ijk->abc", win.astype(np.uint8), pat.astype(np.uint8), optimize=True
        )
        anchors = np.argwhere(conflicts == 0)
        if anchors.size == 0:
            return None
        f0, y0, x0 = (int(v) for v in anchors[0])
        self.occ[f0 : f0 + pf, y0 : y0 + py, x0 : x0 + px] |= pat
        return f0, y0, x0

    def try_place(self, ext: Tuple[int, int, int]) -> Tuple[int, int, int] | None:
        """First anchor (lexicographic f,y,x) whose ext+1 window is empty."""
        F, Y, X = self.shape
        ef, ey, ex = ext
        if ef > F or ey > Y or ex > X:
            return None
        # summed-area table over the padded occupancy grid
        s = np.zeros((F + 2, Y + 2, X + 2), np.int32)
        s[1:, 1:, 1:] = self.occ.cumsum(0).cumsum(1).cumsum(2)
        # window sums of size (ef+1, ey+1, ex+1) at every anchor in
        # [0, F-ef] x [0, Y-ey] x [0, X-ex] (window always fits in the pad)
        wf, wy, wx = ef + 1, ey + 1, ex + 1
        nf, ny, nx = F - ef + 1, Y - ey + 1, X - ex + 1
        win = (
            s[wf : wf + nf, wy : wy + ny, wx : wx + nx]
            - s[:nf, wy : wy + ny, wx : wx + nx]
            - s[wf : wf + nf, :ny, wx : wx + nx]
            - s[wf : wf + nf, wy : wy + ny, :nx]
            + s[:nf, :ny, wx : wx + nx]
            + s[:nf, wy : wy + ny, :nx]
            + s[wf : wf + nf, :ny, :nx]
            - s[:nf, :ny, :nx]
        )
        anchors = np.argwhere(win == 0)
        if anchors.size == 0:
            return None
        f0, y0, x0 = (int(v) for v in anchors[0])
        self.occ[f0 : f0 + wf, y0 : y0 + wy, x0 : x0 + wx] = True
        return f0, y0, x0


def _cell_pattern(voxel: VoxelGraph, ext: Tuple[int, int, int]) -> np.ndarray:
    pat = np.zeros(ext, bool)
    loc = voxel.location
    pat[loc[:, 0], loc[:, 1], loc[:, 2]] = True
    return pat


def _first_fit_decreasing(
    samples: Sequence[Tuple[LocalGraph, VoxelGraph]],
    shape: Tuple[int, int, int],
    K: int,
    max_slots: int | None = None,
    local_budget: int | None = None,
    mode: str = "bbox_gap",
) -> list | None:
    """First-fit-decreasing 3D packing; opens slots as needed.

    ``local_budget`` caps the total program-graph nodes per slot (the packed
    ``GRID_LOCAL_NODES`` width) — a slot that cannot absorb a building's
    local nodes is skipped, so any K/budget combination packs (slots just
    hold fewer buildings).  ``mode`` selects gap ("bbox_gap") vs gap-free
    ("cell") placement — see ``_Slot``.  Returns the list of filled
    ``_Slot``s, or None if ``max_slots`` is given and exceeded.
    """
    order = sorted(
        range(len(samples)),
        key=lambda i: -int(np.prod(samples[i][1].location.max(axis=0) + 1)),
    )
    slots: list[_Slot] = []
    for i in order:
        ext = tuple(int(e) for e in samples[i][1].location.max(axis=0) + 1)
        pat = _cell_pattern(samples[i][1], ext) if mode == "cell" else None
        nl = samples[i][0].x.shape[0]
        if local_budget is not None and nl > local_budget:
            raise ValueError(
                f"building {samples[i][1].data_number}: {nl} local nodes exceed "
                f"GRID_LOCAL_NODES={local_budget}"
            )
        placed = False
        for slot in slots:
            if len(slot.placed) >= K:
                continue
            if local_budget is not None and slot.local_used + nl > local_budget:
                continue
            off = slot.try_place_cells(pat) if mode == "cell" else slot.try_place(ext)
            if off is not None:
                slot.placed.append((i, off))
                slot.local_used += nl
                placed = True
                break
        if not placed:
            if max_slots is not None and len(slots) >= max_slots:
                return None
            slot = _Slot(shape, mode=mode)
            off = slot.try_place_cells(pat) if mode == "cell" else slot.try_place(ext)
            if off is None:
                raise ValueError(f"building ext {ext} exceeds grid shape {shape}")
            slot.placed.append((i, off))
            slot.local_used += nl
            slots.append(slot)
    return slots


def plan_packing_slots(
    samples: Sequence[Tuple[LocalGraph, VoxelGraph]],
    cfg: Configuration,
) -> list:
    """Greedy packing plan over an unbounded slot count (list of ``_Slot``).

    Slice into windows of ``GRID_BATCH`` slots and fill each with
    :func:`pack_grid_multi_from_slots` for fixed-shape batches.
    """
    return _first_fit_decreasing(
        samples, cfg.GRID_SHAPE, cfg.GRID_SLOT_GRAPHS,
        local_budget=cfg.GRID_LOCAL_NODES,
        mode=getattr(cfg, "GRID_PACK_MODE", "bbox_gap"),
    )


def plan_packing(
    samples: Sequence[Tuple[LocalGraph, VoxelGraph]],
    cfg: Configuration,
) -> list[list[int]]:
    """Index view of :func:`plan_packing_slots`: sample indices per slot."""
    return [[i for i, _ in s.placed] for s in plan_packing_slots(samples, cfg)]


def pack_grid_multi(
    samples: Sequence[Tuple[LocalGraph, VoxelGraph]],
    cfg: Configuration,
    batch_slots: int | None = None,
    graphs_per_slot: int | None = None,
) -> GridBatch:
    """3D-bin-pack buildings into grid slots (multiple buildings per slot).

    First-fit-decreasing by bounding-box volume over open slots.  Placement
    granularity follows ``cfg.GRID_PACK_MODE``: ``"bbox_gap"`` reserves the
    bbox + 1-cell positive margin (buildings never face-adjacent);
    ``"cell"`` reserves only the actual cells, gap-free (gid-aware stencils
    keep buildings isolated).  Raises if the batch does not fit — callers
    size ``GRID_BATCH``/``GRID_SLOT_GRAPHS`` from their data.

    Features keep their original per-building values (locations/coordinates
    are building-local in the reference layout, `data.py:291-323`); only the
    placement indices are offset.
    """
    F, Y, X = cfg.GRID_SHAPE
    B = batch_slots if batch_slots is not None else cfg.GRID_BATCH
    K = graphs_per_slot if graphs_per_slot is not None else cfg.GRID_SLOT_GRAPHS
    NL = cfg.GRID_LOCAL_NODES

    slots = _first_fit_decreasing(
        samples, (F, Y, X), K, max_slots=B, local_budget=NL,
        mode=getattr(cfg, "GRID_PACK_MODE", "bbox_gap"),
    )
    if slots is None:
        raise ValueError(
            f"pack_grid_multi: {len(samples)} buildings do not fit "
            f"in {B} slots of {cfg.GRID_SHAPE} with K={K}"
        )
    return pack_grid_multi_from_slots(samples, slots, cfg, batch_slots=B, graphs_per_slot=K)


def pack_grid_multi_from_slots(
    samples: Sequence[Tuple[LocalGraph, VoxelGraph]],
    slots: Sequence[_Slot],
    cfg: Configuration,
    batch_slots: int | None = None,
    graphs_per_slot: int | None = None,
) -> GridBatch:
    """Fill a GridBatch from precomputed slot placements (see plan_packing).

    Lets a dataset-level packing plan be sliced into fixed-shape batches
    without re-running (and possibly diverging from) the bin packer.
    """
    F, Y, X = cfg.GRID_SHAPE
    B = batch_slots if batch_slots is not None else cfg.GRID_BATCH
    K = graphs_per_slot if graphs_per_slot is not None else cfg.GRID_SLOT_GRAPHS
    NL = cfg.GRID_LOCAL_NODES
    assert len(slots) <= B, f"{len(slots)} planned slots exceed {B} batch slots"
    slots = list(slots) + [_Slot((F, Y, X)) for _ in range(B - len(slots))]

    x = np.zeros((B, F, Y, X, 12), np.float32)
    typ = np.zeros((B, F, Y, X), np.int32)
    mask = np.zeros((B, F, Y, X), np.float32)
    dim = np.zeros((B, F, Y, X, 3), np.float32)
    gid = np.zeros((B, F, Y, X), np.int32)
    local_x = np.zeros((B, NL, 17), np.float32)
    local_type = np.zeros((B, NL), np.int32)
    local_mask = np.zeros((B, NL), np.float32)
    local_gid = np.zeros((B, NL), np.int32)
    graph_mask = np.zeros((B, K), np.float32)
    far = np.zeros((B, K), np.float32)
    site_area = np.ones((B, K), np.float32)

    for b, slot in enumerate(slots):
        nl_used = 0
        for k, (i, (f0, y0, x0)) in enumerate(slot.placed):
            local, voxel = samples[i]
            loc = voxel.location
            f_, y_, x_ = loc[:, 0] + f0, loc[:, 1] + y0, loc[:, 2] + x0
            x[b, f_, y_, x_] = voxel.x
            typ[b, f_, y_, x_] = voxel.types
            mask[b, f_, y_, x_] = 1.0
            dim[b, f_, y_, x_] = voxel.dimension
            gid[b, f_, y_, x_] = k

            n = local.x.shape[0]
            assert nl_used + n <= NL, (
                f"slot {b}: local nodes overflow ({nl_used}+{n} > {NL}); "
                f"raise GRID_LOCAL_NODES for multi-building slots"
            )
            local_x[b, nl_used : nl_used + n] = local.x
            local_type[b, nl_used : nl_used + n] = local.types
            local_mask[b, nl_used : nl_used + n] = 1.0
            local_gid[b, nl_used : nl_used + n] = k
            nl_used += n

            graph_mask[b, k] = 1.0
            far[b, k] = voxel.far
            site_area[b, k] = voxel.site_area

    return GridBatch(
        x=x, type=typ, mask=mask, dimension=dim,
        local_x=local_x, local_type=local_type, local_mask=local_mask,
        graph_mask=graph_mask, far=far, site_area=site_area,
        gid=gid, local_gid=local_gid,
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
