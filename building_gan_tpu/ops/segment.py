"""Masked segment ops for padded graph batches.

These are the TPU-native replacement for PyG's scatter CUDA kernels
(reference usage: `building_gan/src/models.py:144, 242` execute GATConv
message passing which bottoms out in index_select + scatter_softmax +
scatter_add).  Everything here takes **static** ``num_segments`` so XLA sees
fixed shapes, and treats padding through explicit masks instead of dynamic
sizes.

Conventions:
- Edge arrays are 1-D ``src``/``dst`` index vectors plus a float ``edge_mask``
  (1.0 = real edge, 0.0 = padding).  Padded edges point at index 0; their
  contributions are multiplied by the mask (or set to -inf for max/softmax).
- Node padding is handled by callers (padded nodes live in a dummy segment or
  are masked after the op).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_NEG_INF = -1e30  # finite stand-in for -inf: keeps masked maxima NaN-free


def segment_sum(values: jnp.ndarray, segment_ids: jnp.ndarray, num_segments: int) -> jnp.ndarray:
    """Sum ``values`` rows into ``num_segments`` buckets (static shape)."""
    return jax.ops.segment_sum(values, segment_ids, num_segments=num_segments)


def segment_mean(
    values: jnp.ndarray,
    segment_ids: jnp.ndarray,
    num_segments: int,
    weights: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Weighted mean per segment; empty segments yield 0 (not NaN)."""
    if weights is not None:
        w = weights.reshape(weights.shape + (1,) * (values.ndim - weights.ndim))
        values = values * w
        counts = jax.ops.segment_sum(weights, segment_ids, num_segments=num_segments)
    else:
        counts = jax.ops.segment_sum(
            jnp.ones(values.shape[0], dtype=values.dtype), segment_ids, num_segments=num_segments
        )
    sums = jax.ops.segment_sum(values, segment_ids, num_segments=num_segments)
    denom = jnp.maximum(counts, 1.0)
    denom = denom.reshape(denom.shape + (1,) * (sums.ndim - denom.ndim))
    return sums / denom


def segment_max(
    values: jnp.ndarray,
    segment_ids: jnp.ndarray,
    num_segments: int,
    mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Max per segment; masked/empty entries produce ``_NEG_INF`` floor."""
    if mask is not None:
        m = mask.reshape(mask.shape + (1,) * (values.ndim - mask.ndim))
        values = jnp.where(m > 0, values, _NEG_INF)
    out = jax.ops.segment_max(values, segment_ids, num_segments=num_segments)
    return jnp.maximum(out, _NEG_INF)  # segment_max fills empty segments with -inf


def segment_softmax(
    scores: jnp.ndarray,
    segment_ids: jnp.ndarray,
    num_segments: int,
    mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Numerically stable softmax over entries sharing a segment id.

    This is the TPU equivalent of PyG's ``scatter_softmax`` used inside
    GATConv.  Masked entries get weight 0; empty segments produce zeros.
    """
    maxes = segment_max(scores, segment_ids, num_segments, mask=mask)
    shifted = scores - maxes[segment_ids]
    exp = jnp.exp(shifted)
    if mask is not None:
        m = mask.reshape(mask.shape + (1,) * (exp.ndim - mask.ndim))
        exp = exp * m
    denom = jax.ops.segment_sum(exp, segment_ids, num_segments=num_segments)
    denom = jnp.maximum(denom, 1e-16)
    return exp / denom[segment_ids]
