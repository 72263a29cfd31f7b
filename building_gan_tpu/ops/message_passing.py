"""Fused GAT message passing: gather -> edge score -> segment softmax -> scatter.

This is the hot op of the framework — the reference spends its time inside PyG
``GATConv``'s CUDA scatter kernels (`building_gan/src/models.py:144, 242`).
Two implementations share one interface:

- ``gat_aggregate_xla``: pure XLA segment ops (reference implementation, runs
  everywhere, used for parity tests).
- ``gat_aggregate_pallas``: fused Pallas TPU kernel over destination-sorted
  edges (see `building_gan_tpu.ops.pallas.gat_kernel`).

``gat_aggregate`` dispatches based on backend and availability.

Semantics (single attention head, PyG GATConv with add_self_loops=True):
    e_ij   = LeakyReLU(a_src[j] + a_dst[i])      for each edge j -> i
    e_ii   = LeakyReLU(a_src[i] + a_dst[i])      implicit self loop
    alpha  = softmax over {e_ij : j in N(i)} + {e_ii}
    out_i  = sum_j alpha_ij h_j + alpha_ii h_i

where ``a_src[j] = att_src . h_j`` and ``a_dst[i] = att_dst . h_i`` are
precomputed per-node scalars.  The self loop is handled analytically — no
extra edges are materialized.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import segment as seg


def _leaky_relu(x: jnp.ndarray, negative_slope: float) -> jnp.ndarray:
    return jnp.where(x >= 0, x, negative_slope * x)


def gat_aggregate_xla(
    h: jnp.ndarray,  # (N, F) transformed node features
    a_src: jnp.ndarray,  # (N,) per-node source attention scalar
    a_dst: jnp.ndarray,  # (N,) per-node destination attention scalar
    src: jnp.ndarray,  # (E,) edge sources
    dst: jnp.ndarray,  # (E,) edge destinations
    edge_mask: jnp.ndarray,  # (E,) 1.0 real / 0.0 padding
    negative_slope: float = 0.2,
) -> jnp.ndarray:
    n = h.shape[0]
    e = _leaky_relu(a_src[src] + a_dst[dst], negative_slope)  # (E,)
    e_self = _leaky_relu(a_src + a_dst, negative_slope)  # (N,)

    m = seg.segment_max(e, dst, n, mask=edge_mask)
    m = jnp.maximum(m, e_self)

    exp_e = jnp.exp(e - m[dst]) * edge_mask  # (E,)
    exp_self = jnp.exp(e_self - m)  # (N,)

    denom = jax.ops.segment_sum(exp_e, dst, num_segments=n) + exp_self
    num = jax.ops.segment_sum(exp_e[:, None] * h[src], dst, num_segments=n)
    num = num + exp_self[:, None] * h
    return num / jnp.maximum(denom, 1e-16)[:, None]


def gat_aggregate(
    h: jnp.ndarray,
    a_src: jnp.ndarray,
    a_dst: jnp.ndarray,
    src: jnp.ndarray,
    dst: jnp.ndarray,
    edge_mask: jnp.ndarray,
    negative_slope: float = 0.2,
) -> jnp.ndarray:
    """Entry point used by the edge-list model layers.

    The fused Pallas kernel exists for the *grid* layout
    (`ops/pallas/hourglass.py` — the flagship path, where the hot op lives);
    the general edge-list path stays on XLA segment ops (see docs/PALLAS.md
    for the measured rationale).
    """
    return gat_aggregate_xla(h, a_src, a_dst, src, dst, edge_mask, negative_slope)
