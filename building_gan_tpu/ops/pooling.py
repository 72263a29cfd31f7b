"""Cross-graph type-matched pooling.

The conditioning trick at the heart of Building-GAN (reference
`building_gan/src/models.py:122-129` and `models.py:230-237`): every voxel node
receives the mean feature of the *program-graph* nodes with the same program
type.  The reference computes the mean over all local nodes of that type in
the merged batch — i.e. across graph boundaries (quirk Q1, SURVEY.md §7).

Both behaviors are provided:
- per-graph (default, the intended semantics): one ``segment_mean`` keyed on
  ``graph_id * NUM_CLASSES + type`` — a single fused scatter/gather, no
  python loop over types like the reference.
- batch-level (``batch_level=True``): parity with the reference quirk.

Voxel nodes whose (graph, type) has no local node get zeros, matching the
reference (which leaves the ``matched_x`` row at its zero initialization).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import NUM_CLASSES


def type_matched_pooling(
    local_x: jnp.ndarray,  # (NL, F) local node features
    local_type: jnp.ndarray,  # (NL,) int
    local_graph_id: jnp.ndarray,  # (NL,) int; padded nodes -> num_graphs
    local_mask: jnp.ndarray,  # (NL,) float
    voxel_type: jnp.ndarray,  # (NV,) int
    voxel_graph_id: jnp.ndarray,  # (NV,) int; padded nodes -> num_graphs
    num_graphs: int,  # graph slots G (padding uses segment G)
    batch_level: bool = False,
) -> jnp.ndarray:
    """Returns (NV, F) matched features for every voxel node."""
    if batch_level:
        # Reference quirk Q1: mean over ALL local nodes of each type.
        sums = jax.ops.segment_sum(
            local_x * local_mask[:, None], local_type, num_segments=NUM_CLASSES
        )
        counts = jax.ops.segment_sum(local_mask, local_type, num_segments=NUM_CLASSES)
        means = sums / jnp.maximum(counts, 1.0)[:, None]
        present = (counts > 0).astype(local_x.dtype)[:, None]
        means = means * present
        return means[voxel_type]

    n_seg = (num_graphs + 1) * NUM_CLASSES  # +1 dummy slot for padded nodes
    local_seg = local_graph_id * NUM_CLASSES + local_type
    sums = jax.ops.segment_sum(local_x * local_mask[:, None], local_seg, num_segments=n_seg)
    counts = jax.ops.segment_sum(local_mask, local_seg, num_segments=n_seg)
    means = sums / jnp.maximum(counts, 1.0)[:, None]
    present = (counts > 0).astype(local_x.dtype)[:, None]
    means = means * present
    voxel_seg = voxel_graph_id * NUM_CLASSES + voxel_type
    return means[voxel_seg]
