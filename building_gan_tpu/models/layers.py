"""Graph layers: conv registry (GCN/Graph/GAT/GATv2), GraphNorm, MLP blocks.

TPU-native re-design of the PyG layers the reference builds its hourglass
encoders from (`building_gan/src/models.py:22-31, 68-90, 166-175, 187-210`).
Message passing is expressed over padded edge lists with masked segment ops
(see `building_gan_tpu.ops.segment`) instead of torch scatter kernels, and the
self-loop term every PyG conv adds implicitly is computed analytically — no
N extra edges are materialized.

Semantics follow the PyG defaults the reference relies on:
- ``GATConv``: heads=1, negative_slope=0.2, add_self_loops=True, bias=True.
  Attention ``e_ij = LeakyReLU(a_src . W x_j + a_dst . W x_i)``, softmax over
  incoming edges of i (self loop included), output ``sum_j alpha_ij W x_j + b``.
- ``GATv2Conv``: separate source/target transforms,
  ``e_ij = a . LeakyReLU(W_l x_j + W_r x_i)``, aggregates ``W_l x_j``.
- ``GCNConv``: symmetric degree normalization over A + I.
- ``GraphConv``: ``W1 x_i + W2 sum_j x_j`` (add aggregation, no self loop).
- ``GraphNorm``: per-segment mean shift with learned alpha
  (``x - alpha * mean``), variance of the shifted value, learned scale/bias.
  The reference invokes GraphNorm WITHOUT a batch vector so statistics span
  the merged batch (quirk Q5, `models.py:72-90`); both behaviors are
  supported via ``segment_ids=None`` vs per-graph ids.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops import segment as seg
from ..ops.dropout import FastDropout
from ..ops.message_passing import gat_aggregate_xla


class MLPBlock(nn.Module):
    """Linear -> LayerNorm -> LeakyReLU(0.2), the reference MLP unit
    (`models.py:33-47, 49-66, 92-113`)."""

    features: int
    dtype: jnp.dtype = jnp.float32
    pack: bool = False  # narrow-GEMM row folding (ops/gemm_pack.py)

    @nn.compact
    def __call__(self, x):
        if self.pack:
            from ..ops.gemm_pack import PackedDense

            x = PackedDense(self.features, dtype=self.dtype, name="dense")(x)
        else:
            x = nn.Dense(self.features, dtype=self.dtype, name="dense")(x)
        x = nn.LayerNorm(dtype=self.dtype, name="norm")(x)
        return nn.leaky_relu(x, negative_slope=0.2)


class GraphNorm(nn.Module):
    """GraphNorm with learned mean scale (PyG `tgnn.norm.GraphNorm` semantics).

    ``segment_ids=None`` reproduces the reference quirk Q5 (statistics over the
    whole merged batch); otherwise statistics are per segment (per graph).
    ``mask`` excludes padded nodes from the statistics.
    """

    features: int
    eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        segment_ids: Optional[jnp.ndarray] = None,
        num_segments: Optional[int] = None,
        mask: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        weight = self.param("weight", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mean_scale = self.param("mean_scale", nn.initializers.ones, (self.features,))

        # One-pass moments + scale/shift, numerically matching the grid-layout
        # GridGraphNorm formulation (grid_layers.py) so grid-vs-edge parity is
        # exact: var = E[(x - mean*ms)^2] = E[x^2] - 2 s E[x] + s^2, f32 stats,
        # output as x*scale + shift in the compute dtype.
        out_dtype = x.dtype
        xf = x.astype(jnp.float32)  # fused into the stat reductions
        w = None if mask is None else mask.astype(jnp.float32)
        if segment_ids is None:
            if w is None:
                mean = jnp.mean(xf, axis=0, keepdims=True)
                ex2 = jnp.mean(xf * xf, axis=0, keepdims=True)
            else:
                denom = jnp.maximum(jnp.sum(w), 1.0)
                mean = jnp.sum(xf * w[:, None], axis=0, keepdims=True) / denom
                ex2 = jnp.sum(xf * xf * w[:, None], axis=0, keepdims=True) / denom
        else:
            assert num_segments is not None
            mean = seg.segment_mean(xf, segment_ids, num_segments, weights=w)[segment_ids]
            ex2 = seg.segment_mean(xf * xf, segment_ids, num_segments, weights=w)[segment_ids]
        s = mean * mean_scale
        var = jnp.maximum(ex2 - 2.0 * s * mean + s * s, 0.0)
        inv = weight * jax.lax.rsqrt(var + self.eps)
        scale = inv.astype(out_dtype)
        shift = (bias - s * inv).astype(out_dtype)
        return x * scale + shift


class GATConv(nn.Module):
    """Single-head GAT layer (PyG GATConv defaults) over a padded edge list."""

    features: int
    negative_slope: float = 0.2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, src, dst, edge_mask):
        n = x.shape[0]
        h = nn.Dense(self.features, use_bias=False, dtype=self.dtype, name="lin")(x)
        att_src = self.param("att_src", nn.initializers.glorot_uniform(), (self.features, 1))
        att_dst = self.param("att_dst", nn.initializers.glorot_uniform(), (self.features, 1))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))

        a_src = (h @ att_src)[:, 0]  # (N,)
        a_dst = (h @ att_dst)[:, 0]  # (N,)
        out = gat_aggregate_xla(  # parity-oracle path (ops/message_passing.py)
            h, a_src, a_dst, src, dst, edge_mask, negative_slope=self.negative_slope
        )
        return out + bias


class GATv2Conv(nn.Module):
    """Single-head GATv2 layer (PyG GATv2Conv, share_weights=False)."""

    features: int
    negative_slope: float = 0.2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, src, dst, edge_mask):
        n = x.shape[0]
        h_l = nn.Dense(self.features, use_bias=True, dtype=self.dtype, name="lin_l")(x)  # source
        h_r = nn.Dense(self.features, use_bias=True, dtype=self.dtype, name="lin_r")(x)  # target
        att = self.param("att", nn.initializers.glorot_uniform(), (self.features, 1))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))

        # e_ij = att . LeakyReLU(h_l[j] + h_r[i]); computed per edge.
        e = nn.leaky_relu(h_l[src] + h_r[dst], negative_slope=self.negative_slope) @ att
        e = e[:, 0]
        e_self = (nn.leaky_relu(h_l + h_r, negative_slope=self.negative_slope) @ att)[:, 0]

        m = seg.segment_max(e, dst, n, mask=edge_mask)
        m = jnp.maximum(m, e_self)
        exp_e = jnp.exp(e - m[dst]) * edge_mask
        exp_self = jnp.exp(e_self - m)
        denom = jax.ops.segment_sum(exp_e, dst, num_segments=n) + exp_self
        num = jax.ops.segment_sum(exp_e[:, None] * h_l[src], dst, num_segments=n)
        num = num + exp_self[:, None] * h_l
        return num / jnp.maximum(denom, 1e-16)[:, None] + bias


class GCNConv(nn.Module):
    """GCN layer with symmetric normalization over A + I (PyG GCNConv)."""

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, src, dst, edge_mask):
        n = x.shape[0]
        h = nn.Dense(self.features, use_bias=False, dtype=self.dtype, name="lin")(x)
        bias = self.param("bias", nn.initializers.zeros, (self.features,))

        deg = jax.ops.segment_sum(edge_mask, dst, num_segments=n) + 1.0  # + self loop
        dinv = jax.lax.rsqrt(deg)
        w = dinv[src] * dinv[dst] * edge_mask
        out = jax.ops.segment_sum(w[:, None] * h[src], dst, num_segments=n)
        out = out + (dinv * dinv)[:, None] * h  # self-loop term
        return out + bias


class GraphConv(nn.Module):
    """GraphConv: W1 x + W2 * sum of neighbors (PyG GraphConv, aggr='add')."""

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, src, dst, edge_mask):
        n = x.shape[0]
        h_nbr = nn.Dense(self.features, use_bias=False, dtype=self.dtype, name="lin_nbr")(x)
        agg = jax.ops.segment_sum(edge_mask[:, None] * h_nbr[src], dst, num_segments=n)
        h_self = nn.Dense(self.features, use_bias=True, dtype=self.dtype, name="lin_self")(x)
        return h_self + agg


CONV_REGISTRY = {
    "GCNCONV": GCNConv,
    "GRAPHCONV": GraphConv,
    "GATCONV": GATConv,
    "GATV2CONV": GATv2Conv,
}


def get_conv(conv_type: str) -> Callable[..., nn.Module]:
    """Conv class by name — mirrors the reference registry (`models.py:22-31`)."""
    if conv_type not in CONV_REGISTRY:
        raise ValueError(f"Invalid conv_type: {conv_type}")
    return CONV_REGISTRY[conv_type]


class HourglassGNN(nn.Module):
    """Hourglass conv stack: ``repeat`` halving layers then ``repeat`` doubling
    layers, each followed by GraphNorm + ReLU + Dropout
    (reference `models.py:68-90, 187-210`).

    Channel schedule from ``hidden_dim`` and ``repeat``: e.g. hidden=128,
    repeat=7 -> 128->64->32->16->8->4->2->1->2->...->128.
    """

    conv_type: str
    hidden_dim: int
    repeat: int
    dropout_rate: float = 0.2
    batch_level_graphnorm: bool = False  # quirk Q5 parity flag
    dtype: jnp.dtype = jnp.float32
    min_channels: int = 1  # config.HOURGLASS_MIN_CHANNELS (twin of grid path)

    @nn.compact
    def __call__(self, x, src, dst, edge_mask, graph_id, num_graphs, node_mask, deterministic: bool):
        from .grid_layers import hourglass_channels

        conv_cls = get_conv(self.conv_type)
        channels = hourglass_channels(self.hidden_dim, self.repeat, self.min_channels)

        seg_ids = None if self.batch_level_graphnorm else graph_id
        n_seg = None if self.batch_level_graphnorm else num_graphs
        for i, ch in enumerate(channels):
            x = conv_cls(features=ch, dtype=self.dtype, name=f"conv_{i}")(x, src, dst, edge_mask)
            x = GraphNorm(features=ch, dtype=self.dtype, name=f"norm_{i}")(
                x, segment_ids=seg_ids, num_segments=n_seg, mask=node_mask
            )
            # Zero padded rows every layer: the dummy segment has no statistics
            # (var=0), so without this the 1/sqrt(eps) scale compounds across
            # layers and padded activations overflow to inf/NaN.
            x = x * node_mask[:, None]
            x = nn.relu(x)
            x = FastDropout(rate=self.dropout_rate)(x, deterministic)
        return x
