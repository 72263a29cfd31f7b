"""In-graph classification metrics from masked confusion matrices.

The reference computes macro F1 / precision / recall / accuracy with sklearn
on the CPU per batch (`building_gan/src/trainer.py:387-443`) — a device->host
sync in the hot loop.  Here the 7x7 confusion matrix is accumulated on device
(one scatter-add), and the sklearn ``average='macro', zero_division=0``
semantics are reproduced exactly:

- per-class precision/recall/F1 with 0 where the denominator is 0;
- the macro mean runs over classes present in ``y_true U y_pred`` (sklearn's
  default label set), not over all 7 classes;
- per-graph scores come from per-graph confusion matrices (segment keyed on
  ``graph_id * 49 + true * 7 + pred``), replacing the python loop at
  `trainer.py:418-439`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import NUM_CLASSES


def confusion_matrix(
    y_true: jnp.ndarray, y_pred: jnp.ndarray, mask: jnp.ndarray
) -> jnp.ndarray:
    """(7, 7) matrix; rows = true, cols = pred; padded entries excluded."""
    idx = y_true * NUM_CLASSES + y_pred
    flat = jax.ops.segment_sum(mask, idx, num_segments=NUM_CLASSES * NUM_CLASSES)
    return flat.reshape(NUM_CLASSES, NUM_CLASSES)


def per_graph_confusion_matrices(
    y_true: jnp.ndarray,
    y_pred: jnp.ndarray,
    mask: jnp.ndarray,
    graph_id: jnp.ndarray,
    num_graphs: int,
) -> jnp.ndarray:
    """(G, 7, 7) per-graph confusion matrices in a single scatter-add."""
    idx = graph_id * (NUM_CLASSES * NUM_CLASSES) + y_true * NUM_CLASSES + y_pred
    flat = jax.ops.segment_sum(
        mask, idx, num_segments=(num_graphs + 1) * NUM_CLASSES * NUM_CLASSES
    )
    return flat.reshape(num_graphs + 1, NUM_CLASSES, NUM_CLASSES)[:num_graphs]


def _scores_from_cm(cm: jnp.ndarray) -> dict:
    """Macro precision/recall/F1 + accuracy from one confusion matrix.

    Matches sklearn ``average='macro', zero_division=0`` with the default
    label set (classes present in y_true or y_pred).
    """
    tp = jnp.diagonal(cm, axis1=-2, axis2=-1)
    support_true = cm.sum(axis=-1)  # row sums
    support_pred = cm.sum(axis=-2)  # col sums
    present = ((support_true + support_pred) > 0).astype(cm.dtype)
    n_present = jnp.maximum(present.sum(axis=-1), 1.0)

    precision = jnp.where(support_pred > 0, tp / jnp.maximum(support_pred, 1.0), 0.0)
    recall = jnp.where(support_true > 0, tp / jnp.maximum(support_true, 1.0), 0.0)
    pr = precision + recall
    f1 = jnp.where(pr > 0, 2.0 * precision * recall / jnp.maximum(pr, 1e-12), 0.0)

    total = jnp.maximum(cm.sum(axis=(-2, -1)), 1.0)
    accuracy = tp.sum(axis=-1) / total
    return {
        "precision": (precision * present).sum(axis=-1) / n_present,
        "recall": (recall * present).sum(axis=-1) / n_present,
        "f1": (f1 * present).sum(axis=-1) / n_present,
        "accuracy": accuracy,
    }


def grid_confusion_matrices(
    y_true: jnp.ndarray,  # (B, F, Y, X)
    y_pred: jnp.ndarray,  # (B, F, Y, X)
    mask: jnp.ndarray,  # (B, F, Y, X)
    gid: jnp.ndarray = None,  # (B, F, Y, X) building index (multi-packed slots)
    num_graphs: int = 1,
) -> jnp.ndarray:
    """Per-graph confusion matrices via dense one-hot einsum — the grid
    layout's scatter-free replacement for the segment-op path.

    Returns (B, 7, 7) for single-building slots, (B, K, 7, 7) when ``gid``
    keys K buildings per slot."""
    oh_p = jax.nn.one_hot(y_pred, NUM_CLASSES)
    if gid is not None and num_graphs > 1:
        # joint (building, true-class) one-hot: one matmul of K*7 channels
        oh_kt = jax.nn.one_hot(gid * NUM_CLASSES + y_true, num_graphs * NUM_CLASSES)
        oh_kt = oh_kt * mask[..., None]
        cms = jnp.einsum("bfyxt,bfyxp->btp", oh_kt, oh_p)
        return cms.reshape(mask.shape[0], num_graphs, NUM_CLASSES, NUM_CLASSES)
    oh_t = jax.nn.one_hot(y_true, NUM_CLASSES) * mask[..., None]
    return jnp.einsum("bfyxt,bfyxp->btp", oh_t, oh_p)


F1_HIST_BINS = 32


def per_graph_f1_hist(
    per_graph_f1: jnp.ndarray, graph_mask: jnp.ndarray, bins: int = F1_HIST_BINS
) -> jnp.ndarray:
    """(bins,) count histogram of per-graph F1 over REAL graphs.

    Counts are additive, so sharded runs ``psum`` them across the mesh and
    recover the exact global distribution the reference logs per batch as a
    python list (`building_gan/src/trainer.py:418-441`) — min / p10 / median
    come out of the epoch-summed histogram on the host (trainer).  Bin i
    covers [i/bins, (i+1)/bins); F1 == 1.0 lands in the last bin.
    """
    idx = jnp.clip((per_graph_f1 * bins).astype(jnp.int32), 0, bins - 1)
    oh = jax.nn.one_hot(idx, bins, dtype=jnp.float32)
    w = (graph_mask > 0).astype(jnp.float32)
    return jnp.sum(oh * w[..., None], axis=tuple(range(oh.ndim - 1)))


def hist_quantile(hist, q: float) -> float:
    """Host-side quantile of a per-graph-F1 count histogram (bin centers).

    Used by the trainer to turn the epoch-summed (psum-exact) histogram into
    the min/p10/median scalars the reference derives from its per-graph F1
    python list (`building_gan/src/trainer.py:418-441`)."""
    import numpy as np

    hist = np.asarray(hist, dtype=np.float64)
    total = hist.sum()
    if total <= 0:
        return 0.0
    bins = hist.shape[0]
    cum = np.cumsum(hist)
    # smallest bin with cum >= q*total (q=0 -> first NONZERO bin, the min)
    i = int(np.searchsorted(cum, max(q * total, 1e-12), side="left"))
    i = min(i, bins - 1)
    return (i + 0.5) / bins


def compute_metrics(
    y_true: jnp.ndarray,
    y_pred: jnp.ndarray,
    mask: jnp.ndarray,
    graph_id: jnp.ndarray = None,
    graph_mask: jnp.ndarray = None,
    gid: jnp.ndarray = None,
    num_graphs_per_slot: int = 1,
) -> dict:
    """Whole-batch macro scores + min per-graph F1 (reference trainer.py:387-443).

    Packed layout: 1-D arrays + ``graph_id`` segment keys.  Grid layout:
    ``(B, F, Y, X)`` arrays (``graph_id`` unused; the batch axis is the graph
    axis, or (batch, gid) with multi-building slots).  Returns scalars: f1,
    f1_min (over real graphs), precision, recall, accuracy.
    """
    if y_true.ndim > 1:  # grid layout
        cms = grid_confusion_matrices(y_true, y_pred, mask, gid, num_graphs_per_slot)
        cm = cms.sum(axis=tuple(range(cms.ndim - 2)))
        batch_scores = _scores_from_cm(cm)
        per_graph = _scores_from_cm(cms)  # (B,) or (B, K)
        f1_min = jnp.min(jnp.where(graph_mask > 0, per_graph["f1"], jnp.inf))
        f1_min = jnp.where(jnp.isfinite(f1_min), f1_min, 0.0)
        return {
            "f1": batch_scores["f1"],
            "f1_min": f1_min,
            "precision": batch_scores["precision"],
            "recall": batch_scores["recall"],
            "accuracy": batch_scores["accuracy"],
            "confusion_matrix": cm,
            "per_graph_f1": per_graph["f1"],
            "per_graph_f1_hist": per_graph_f1_hist(per_graph["f1"], graph_mask),
        }

    num_graphs = graph_mask.shape[0]
    cm = confusion_matrix(y_true, y_pred, mask)
    batch_scores = _scores_from_cm(cm)

    cms = per_graph_confusion_matrices(y_true, y_pred, mask, graph_id, num_graphs)
    per_graph = _scores_from_cm(cms)
    f1_min = jnp.min(jnp.where(graph_mask > 0, per_graph["f1"], jnp.inf))
    f1_min = jnp.where(jnp.isfinite(f1_min), f1_min, 0.0)

    return {
        "f1": batch_scores["f1"],
        "f1_min": f1_min,
        "precision": batch_scores["precision"],
        "recall": batch_scores["recall"],
        "accuracy": batch_scores["accuracy"],
        "confusion_matrix": cm,
        "per_graph_f1": per_graph["f1"],
        "per_graph_f1_hist": per_graph_f1_hist(per_graph["f1"], graph_mask),
    }
