"""Dense 3D-stencil message passing — the TPU fast path.

Structural observation (SURVEY.md §2, reference `data.py:291-335`): voxel
graphs are axis-aligned irregular *grids* — every node has a unique integer
``location = (floor, iy, ix)`` and neighbors are the <=6 face-adjacent cells.
The reference still processes them as generic edge lists through PyG scatter
kernels; on TPU that lowers to serialized gathers/scatters (measured ~340 ms
per 131k-edge gather on v5e).  Laying the voxels out as a dense
``(B, F, Y, X, C)`` block turns message passing into a 6-point stencil:
shifts + elementwise math + one big GEMM per layer — MXU/VPU work with zero
gathers (measured ~1.3 ms/layer for 110k cells, ~250x faster).

All four conv types of the reference registry (`models.py:22-31`) are
implemented over the stencil neighborhood with semantics identical to the
edge-list path (verified by grid-vs-edge parity tests):

- GAT / GATv2: per-direction attention scores, masked softmax over
  {6 neighbors + self}, weighted sum.
- GCN: symmetric degree normalization over A + I where degree counts valid
  neighbors.
- GraphConv: W1 x + W2 * sum(neighbors).

``mask`` marks valid cells; invalid cells contribute nothing (their features
and scores are masked) and their outputs are zeroed.

``gid`` (optional, multi-building slots) marks each cell with its building
index: a neighbor is valid only if it is masked AND carries the same gid.
This lets the 3D bin packer place buildings face-adjacent (gap-free "cell"
packing mode, `data/grid.py`) without messages leaking across buildings —
the gid compare is a scalar-plane op, ~1.5% of the feature bytes it saves.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

_NEG_INF = -1e30

# six face-adjacent directions as (axis, shift): axis 1=floor, 2=y, 3=x of a
# (B, F, Y, X, C) tensor; shift +1 means "neighbor at index-1 contributes to
# index" (i.e. data moves +1 along the axis).
DIRECTIONS: Tuple[Tuple[int, int], ...] = (
    (1, 1), (1, -1), (2, 1), (2, -1), (3, 1), (3, -1),
)


def shift(x: jnp.ndarray, axis: int, d: int) -> jnp.ndarray:
    """Shift with zero fill (NOT circular): slice + pad.

    ``shift(x, axis, +1)[..., i, ...] == x[..., i-1, ...]`` — the neighbor at
    the smaller index moves forward.  Zero fill keeps out-of-grid neighbors
    inert.
    """
    n = x.shape[axis]
    pad = [(0, 0)] * x.ndim
    if d > 0:
        sliced = jax.lax.slice_in_dim(x, 0, n - d, axis=axis)
        pad[axis] = (d, 0)
    else:
        sliced = jax.lax.slice_in_dim(x, -d, n, axis=axis)
        pad[axis] = (0, -d)
    return jnp.pad(sliced, pad)


def neighbor_stack(x: jnp.ndarray) -> jnp.ndarray:
    """(B, F, Y, X, ...) -> (6, B, F, Y, X, ...): the 6 shifted copies."""
    return jnp.stack([shift(x, a, d) for a, d in DIRECTIONS], axis=0)


def neighbor_mask(mask: jnp.ndarray, gid: jnp.ndarray | None = None) -> jnp.ndarray:
    """(B,F,Y,X) validity -> (6,B,F,Y,X): neighbor-exists mask per direction.

    With ``gid`` (same shape as ``mask``), a neighbor is valid only when it
    belongs to the same building: cross-building faces created by gap-free
    cell packing are structurally not edges.
    """
    nv = neighbor_stack(mask)
    if gid is not None:
        same = jnp.stack([shift(gid, a, d) == gid for a, d in DIRECTIONS], axis=0)
        nv = nv * same.astype(nv.dtype)
    return nv


def stencil_gat(
    h: jnp.ndarray,  # (B, F, Y, X, C) transformed features (W x)
    a_src: jnp.ndarray,  # (B, F, Y, X) per-cell source attention scalar
    a_dst: jnp.ndarray,  # (B, F, Y, X) per-cell destination attention scalar
    mask: jnp.ndarray,  # (B, F, Y, X) cell validity
    negative_slope: float = 0.2,
    gid: jnp.ndarray | None = None,  # (B, F, Y, X) building id (cell packing)
) -> jnp.ndarray:
    """GAT aggregation over the 6-neighborhood + implicit self loop.

    Equivalent to `ops.message_passing.gat_aggregate_xla` on the grid's edge
    list (PyG GATConv semantics, add_self_loops=True, single head).

    Per-direction feature contributions are accumulated in a loop rather than
    stacked: only scalar (B,F,Y,X) score planes are materialized per
    direction, never a (6, ..., C) feature tensor — the C-sized shifts fuse
    into the accumulation, keeping HBM traffic ~6x lower.
    """
    # scalar score planes per direction (cheap: no channel axis).  Score math
    # (leaky-relu / max / exp / normalize) runs in f32 even when features are
    # bf16; only the normalized weights are cast down for the accumulation.
    a_src = a_src.astype(jnp.float32)
    a_dst = a_dst.astype(jnp.float32)
    maskf = mask.astype(jnp.float32)
    nbr_a_src = neighbor_stack(a_src)  # (6, B,F,Y,X)
    nbr_valid = neighbor_mask(maskf, gid)  # (6, B,F,Y,X)

    e = nbr_a_src + a_dst[None]  # score of edge (neighbor -> cell)
    e = jnp.where(e >= 0, e, negative_slope * e)
    e = jnp.where(nbr_valid > 0, e, _NEG_INF)

    e_self = a_src + a_dst
    e_self = jnp.where(e_self >= 0, e_self, negative_slope * e_self)

    m = jnp.maximum(jnp.max(e, axis=0), e_self)
    exp_e = jnp.exp(e - m[None]) * nbr_valid  # (6, B,F,Y,X)
    exp_self = jnp.exp(e_self - m)

    denom = jnp.maximum(jnp.sum(exp_e, axis=0) + exp_self, 1e-16)
    alpha = (exp_e / denom[None]).astype(h.dtype)  # normalized weights
    alpha_self = (exp_self / denom).astype(h.dtype)
    hm = h * mask[..., None].astype(h.dtype)
    num = alpha_self[..., None] * h
    for d, (axis, sh) in enumerate(DIRECTIONS):
        num = num + alpha[d][..., None] * shift(hm, axis, sh)
    return num * mask[..., None].astype(h.dtype)


def stencil_gatv2(
    h_l: jnp.ndarray,  # (B,F,Y,X,C) source transform (W_l x)
    h_r: jnp.ndarray,  # (B,F,Y,X,C) target transform (W_r x)
    att: jnp.ndarray,  # (C,) attention vector
    mask: jnp.ndarray,
    negative_slope: float = 0.2,
    gid: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """GATv2: e_ij = att . LeakyReLU(h_l[j] + h_r[i]); aggregates h_l[j]."""
    hl_m = h_l * mask[..., None].astype(h_l.dtype)
    maskf = mask.astype(jnp.float32)
    nbr_valid = neighbor_mask(maskf, gid)

    # GATv2 scores are feature-nonlinear, so per-direction C-sized work is
    # unavoidable; still loop (never stack) the feature tensors.  Score
    # reductions accumulate in f32 (preferred_element_type) even for bf16
    # features; softmax/normalization run fully in f32.
    att = att.astype(h_l.dtype)
    es = []
    for axis, sh in DIRECTIONS:
        z = shift(hl_m, axis, sh) + h_r
        z = jnp.where(z >= 0, z, negative_slope * z)
        es.append(jnp.einsum("bfyxc,c->bfyx", z, att, preferred_element_type=jnp.float32))
    e = jnp.stack(es, axis=0)  # (6, B,F,Y,X) scalar planes
    e = jnp.where(nbr_valid > 0, e, _NEG_INF)

    z_self = h_l + h_r
    z_self = jnp.where(z_self >= 0, z_self, negative_slope * z_self)
    e_self = jnp.einsum("bfyxc,c->bfyx", z_self, att, preferred_element_type=jnp.float32)

    m = jnp.maximum(jnp.max(e, axis=0), e_self)
    exp_e = jnp.exp(e - m[None]) * nbr_valid
    exp_self = jnp.exp(e_self - m)

    denom = jnp.maximum(jnp.sum(exp_e, axis=0) + exp_self, 1e-16)
    alpha = (exp_e / denom[None]).astype(h_l.dtype)
    alpha_self = (exp_self / denom).astype(h_l.dtype)
    num = alpha_self[..., None] * h_l
    for d, (axis, sh) in enumerate(DIRECTIONS):
        num = num + alpha[d][..., None] * shift(hl_m, axis, sh)
    return num * mask[..., None].astype(h_l.dtype)


def stencil_gcn(
    h: jnp.ndarray, mask: jnp.ndarray, gid: jnp.ndarray | None = None
) -> jnp.ndarray:
    """GCN aggregation: D^-1/2 (A+I) D^-1/2 over the 6-neighborhood."""
    maskf = mask.astype(jnp.float32)
    nbr_valid = neighbor_mask(maskf, gid)  # (6,B,F,Y,X) scalar planes only
    deg = jnp.sum(nbr_valid, axis=0) + 1.0  # + self loop
    dinv = jax.lax.rsqrt(deg)

    scaled = h * (dinv * maskf)[..., None].astype(h.dtype)
    agg = scaled
    for d, (axis, sh) in enumerate(DIRECTIONS):
        t = shift(scaled, axis, sh)
        if gid is not None:
            # cell packing: a masked-valid neighbor may belong to another
            # building — gate the feature contribution per direction
            t = t * nbr_valid[d][..., None].astype(h.dtype)
        agg = agg + t
    # without gid, shifted-in values from invalid cells are zero (scaled is
    # masked), so no per-direction validity multiply is needed
    out = agg * dinv[..., None].astype(h.dtype)
    return out * mask[..., None].astype(h.dtype)


def stencil_sum(
    h: jnp.ndarray, mask: jnp.ndarray, gid: jnp.ndarray | None = None
) -> jnp.ndarray:
    """Plain neighbor sum (GraphConv aggregation, no self loop)."""
    hm = h * mask[..., None].astype(h.dtype)
    nbr_valid = None if gid is None else neighbor_mask(mask.astype(jnp.float32), gid)
    out = jnp.zeros_like(h)
    for d, (axis, sh) in enumerate(DIRECTIONS):
        t = shift(hm, axis, sh)
        if nbr_valid is not None:
            t = t * nbr_valid[d][..., None].astype(h.dtype)
        out = out + t
    return out * mask[..., None].astype(h.dtype)


# ---------------------------------------------------------------------------
# Flattened-row layout — the TPU-tiling-friendly fast path
# ---------------------------------------------------------------------------
#
# A (B, F, Y, X[, C]) block tiles its last two dims onto TPU (sublane, lane)
# registers: scalar planes (..., 12, 12) pad 12->8·k sublanes AND 12->128
# lanes (~9.5x physical bytes), and feature tensors (..., 12, 128) pad
# 12->16 sublanes (+33%).  Flattening the spatial dims to R = F*Y*X (e.g.
# 1584 -> 1664 padded, ~5%) removes both paddings; profiling the train step
# on v5e showed ~40% of HBM traffic was pure tile padding in the 5-D layout.
#
# The 6-neighbor stencil becomes row shifts by {±Y·X, ±X, ±1} plus STATIC
# per-direction boundary masks (a wrapped x/y shift lands in an adjacent
# row's valid cell — structurally not a neighbor).  Floor shifts never wrap.
# Order matches DIRECTIONS: (floor+, floor-, y+, y-, x+, x-).

import numpy as _np
from functools import lru_cache as _lru_cache


@_lru_cache(maxsize=None)
def _flat_dirs(grid_shape: Tuple[int, int, int]):
    """[(offset, boundary_mask (R,) f32 or None)] for the 6 directions."""
    F, Y, X = grid_shape
    R = F * Y * X
    iy = (_np.arange(R) // X) % Y
    ix = _np.arange(R) % X
    dirs = []
    for stride, s, bm in (
        (Y * X, 1, None),
        (Y * X, -1, None),
        (X, 1, iy >= 1),
        (X, -1, iy <= Y - 2),
        (1, 1, ix >= 1),
        (1, -1, ix <= X - 2),
    ):
        mask = None if bm is None else _np.asarray(bm, _np.float32)
        dirs.append((s * stride, mask))
    return tuple(dirs)


def _nbr_valid_flat(maskf: jnp.ndarray, grid_shape, gid: jnp.ndarray | None = None) -> jnp.ndarray:
    """(6, B, R) neighbor-exists mask incl. structural row boundaries.

    ``gid`` (B, R) additionally requires the neighbor to belong to the same
    building (gap-free cell packing; see module docstring)."""
    planes = []
    for off, bm in _flat_dirs(grid_shape):
        p = shift(maskf, 1, off)
        if bm is not None:
            p = p * jnp.asarray(bm)[None, :]
        if gid is not None:
            p = p * (shift(gid, 1, off) == gid).astype(p.dtype)
        planes.append(p)
    return jnp.stack(planes, axis=0)


def stencil_gat_flat(
    h: jnp.ndarray,  # (B, R, C) transformed features (W x)
    a_src: jnp.ndarray,  # (B, R)
    a_dst: jnp.ndarray,  # (B, R)
    mask: jnp.ndarray,  # (B, R)
    grid_shape: Tuple[int, int, int],
    negative_slope: float = 0.2,
    gid: jnp.ndarray | None = None,  # (B, R)
) -> jnp.ndarray:
    """`stencil_gat` on the flattened-row layout (identical semantics)."""
    a_src = a_src.astype(jnp.float32)
    a_dst = a_dst.astype(jnp.float32)
    maskf = mask.astype(jnp.float32)
    dirs = _flat_dirs(grid_shape)
    nbr_a_src = jnp.stack([shift(a_src, 1, off) for off, _ in dirs], axis=0)
    nbr_valid = _nbr_valid_flat(maskf, grid_shape, gid)

    e = nbr_a_src + a_dst[None]
    e = jnp.where(e >= 0, e, negative_slope * e)
    e = jnp.where(nbr_valid > 0, e, _NEG_INF)

    e_self = a_src + a_dst
    e_self = jnp.where(e_self >= 0, e_self, negative_slope * e_self)

    m = jnp.maximum(jnp.max(e, axis=0), e_self)
    exp_e = jnp.exp(e - m[None]) * nbr_valid
    exp_self = jnp.exp(e_self - m)

    denom = jnp.maximum(jnp.sum(exp_e, axis=0) + exp_self, 1e-16)
    alpha = (exp_e / denom[None]).astype(h.dtype)
    alpha_self = (exp_self / denom).astype(h.dtype)
    hm = h * mask[..., None].astype(h.dtype)
    num = alpha_self[..., None] * h
    for d, (off, _) in enumerate(dirs):
        # wrapped-in rows carry alpha == 0 (nbr_valid boundary-masked above)
        num = num + alpha[d][..., None] * shift(hm, 1, off)
    return num * mask[..., None].astype(h.dtype)


def stencil_gatv2_flat(
    h_l: jnp.ndarray,
    h_r: jnp.ndarray,
    att: jnp.ndarray,
    mask: jnp.ndarray,
    grid_shape: Tuple[int, int, int],
    negative_slope: float = 0.2,
    gid: jnp.ndarray | None = None,
) -> jnp.ndarray:
    hl_m = h_l * mask[..., None].astype(h_l.dtype)
    maskf = mask.astype(jnp.float32)
    dirs = _flat_dirs(grid_shape)
    nbr_valid = _nbr_valid_flat(maskf, grid_shape, gid)

    att = att.astype(h_l.dtype)
    es = []
    for off, _ in dirs:
        z = shift(hl_m, 1, off) + h_r
        z = jnp.where(z >= 0, z, negative_slope * z)
        es.append(jnp.einsum("brc,c->br", z, att, preferred_element_type=jnp.float32))
    e = jnp.stack(es, axis=0)
    e = jnp.where(nbr_valid > 0, e, _NEG_INF)

    z_self = h_l + h_r
    z_self = jnp.where(z_self >= 0, z_self, negative_slope * z_self)
    e_self = jnp.einsum("brc,c->br", z_self, att, preferred_element_type=jnp.float32)

    m = jnp.maximum(jnp.max(e, axis=0), e_self)
    exp_e = jnp.exp(e - m[None]) * nbr_valid
    exp_self = jnp.exp(e_self - m)

    denom = jnp.maximum(jnp.sum(exp_e, axis=0) + exp_self, 1e-16)
    alpha = (exp_e / denom[None]).astype(h_l.dtype)
    alpha_self = (exp_self / denom).astype(h_l.dtype)
    num = alpha_self[..., None] * h_l
    for d, (off, _) in enumerate(dirs):
        num = num + alpha[d][..., None] * shift(hl_m, 1, off)
    return num * mask[..., None].astype(h_l.dtype)


def stencil_gcn_flat(
    h: jnp.ndarray,
    mask: jnp.ndarray,
    grid_shape: Tuple[int, int, int],
    gid: jnp.ndarray | None = None,
) -> jnp.ndarray:
    maskf = mask.astype(jnp.float32)
    dirs = _flat_dirs(grid_shape)
    nbr_valid = _nbr_valid_flat(maskf, grid_shape, gid)
    deg = jnp.sum(nbr_valid, axis=0) + 1.0
    dinv = jax.lax.rsqrt(deg)

    scaled = h * (dinv * maskf)[..., None].astype(h.dtype)
    agg = scaled
    for d, (off, bm) in enumerate(dirs):
        t = shift(scaled, 1, off)
        if gid is not None:
            # cell packing: gate contributions from other buildings
            t = t * nbr_valid[d][..., None].astype(h.dtype)
        elif bm is not None:
            # wrapped-in values come from VALID cells of adjacent rows; mask
            t = t * jnp.asarray(bm, dtype=h.dtype)[None, :, None]
        agg = agg + t
    out = agg * dinv[..., None].astype(h.dtype)
    return out * mask[..., None].astype(h.dtype)


def stencil_sum_flat(
    h: jnp.ndarray,
    mask: jnp.ndarray,
    grid_shape: Tuple[int, int, int],
    gid: jnp.ndarray | None = None,
) -> jnp.ndarray:
    hm = h * mask[..., None].astype(h.dtype)
    nbr_valid = (
        None if gid is None else _nbr_valid_flat(mask.astype(jnp.float32), grid_shape, gid)
    )
    out = jnp.zeros_like(h)
    for d, (off, bm) in enumerate(_flat_dirs(grid_shape)):
        t = shift(hm, 1, off)
        if nbr_valid is not None:
            t = t * nbr_valid[d][..., None].astype(h.dtype)
        elif bm is not None:
            t = t * jnp.asarray(bm, dtype=h.dtype)[None, :, None]
        out = out + t
    return out * mask[..., None].astype(h.dtype)
