"""Grid-layout model layers, parameter-compatible with the edge-list layers.

Every module here mirrors its edge-list counterpart in `models/layers.py` with
IDENTICAL parameter names and shapes, so one parameter pytree drives both
paths — grid-vs-edge parity tests (and checkpoints) carry over directly.
Compute runs over dense ``(B, F, Y, X, C)`` blocks via `ops.stencil`.
"""

from __future__ import annotations



import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops import stencil


class GridGraphNorm(nn.Module):
    """GraphNorm over grid cells; per-graph stats (or whole-batch for quirk Q5).

    Parameter-compatible with `layers.GraphNorm`.
    """

    features: int
    eps: float = 1e-5
    batch_level: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
        weight = self.param("weight", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mean_scale = self.param("mean_scale", nn.initializers.ones, (self.features,))

        m = mask[..., None]
        if self.batch_level:
            axes = tuple(range(x.ndim - 1))  # all cell axes incl. batch
            denom = jnp.maximum(jnp.sum(mask), 1.0)
        else:
            axes = tuple(range(1, x.ndim - 1))  # per-graph cell axes
            denom = jnp.maximum(
                jnp.sum(mask, axis=tuple(range(1, mask.ndim)), keepdims=False), 1.0
            )[:, None, None, None, None][:, 0, 0, 0, :]
            denom = denom.reshape((-1,) + (1,) * (x.ndim - 2) + (1,))
        mean = jnp.sum(x * m, axis=axes, keepdims=True) / denom
        out = x - mean * mean_scale
        var = jnp.sum((out * out) * m, axis=axes, keepdims=True) / denom
        std = jnp.sqrt(var + self.eps)
        return (weight * out / std + bias) * m


class GridGATConv(nn.Module):
    """GAT over the 6-neighborhood; params match `layers.GATConv`."""

    features: int
    negative_slope: float = 0.2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask):
        h = nn.Dense(self.features, use_bias=False, dtype=self.dtype, name="lin")(x)
        att_src = self.param("att_src", nn.initializers.glorot_uniform(), (self.features, 1))
        att_dst = self.param("att_dst", nn.initializers.glorot_uniform(), (self.features, 1))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))

        a_src = jnp.einsum("...c,cd->...d", h, att_src)[..., 0]
        a_dst = jnp.einsum("...c,cd->...d", h, att_dst)[..., 0]
        out = stencil.stencil_gat(h, a_src, a_dst, mask, negative_slope=self.negative_slope)
        return out + bias


class GridGATv2Conv(nn.Module):
    """GATv2 over the 6-neighborhood; params match `layers.GATv2Conv`."""

    features: int
    negative_slope: float = 0.2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask):
        h_l = nn.Dense(self.features, use_bias=True, dtype=self.dtype, name="lin_l")(x)
        h_r = nn.Dense(self.features, use_bias=True, dtype=self.dtype, name="lin_r")(x)
        att = self.param("att", nn.initializers.glorot_uniform(), (self.features, 1))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        out = stencil.stencil_gatv2(
            h_l, h_r, att[:, 0], mask, negative_slope=self.negative_slope
        )
        return out + bias


class GridGCNConv(nn.Module):
    """GCN over the 6-neighborhood; params match `layers.GCNConv`."""

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask):
        h = nn.Dense(self.features, use_bias=False, dtype=self.dtype, name="lin")(x)
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return stencil.stencil_gcn(h, mask) + bias


class GridGraphConv(nn.Module):
    """GraphConv over the 6-neighborhood; params match `layers.GraphConv`."""

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask):
        h_nbr = nn.Dense(self.features, use_bias=False, dtype=self.dtype, name="lin_nbr")(x)
        agg = stencil.stencil_sum(h_nbr, mask)
        h_self = nn.Dense(self.features, use_bias=True, dtype=self.dtype, name="lin_self")(x)
        return h_self + agg


GRID_CONV_REGISTRY = {
    "GCNCONV": GridGCNConv,
    "GRAPHCONV": GridGraphConv,
    "GATCONV": GridGATConv,
    "GATV2CONV": GridGATv2Conv,
}


class GridHourglass(nn.Module):
    """Hourglass stencil-conv stack; params match `layers.HourglassGNN`."""

    conv_type: str
    hidden_dim: int
    repeat: int
    dropout_rate: float = 0.2
    batch_level_graphnorm: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask, deterministic: bool):
        conv_cls = GRID_CONV_REGISTRY[self.conv_type]
        channels = []
        c = self.hidden_dim
        for _ in range(self.repeat):
            c //= 2
            channels.append(c)
        for _ in range(self.repeat):
            c *= 2
            channels.append(c)

        for i, ch in enumerate(channels):
            x = conv_cls(features=ch, dtype=self.dtype, name=f"conv_{i}")(x, mask)
            x = GridGraphNorm(
                features=ch,
                batch_level=self.batch_level_graphnorm,
                dtype=self.dtype,
                name=f"norm_{i}",
            )(x, mask)
            x = nn.relu(x)
            x = nn.Dropout(rate=self.dropout_rate, deterministic=deterministic)(x)
        return x


def grid_type_matched_pooling(
    local_x: jnp.ndarray,  # (B, NL, F)
    local_type: jnp.ndarray,  # (B, NL)
    local_mask: jnp.ndarray,  # (B, NL)
    voxel_type: jnp.ndarray,  # (B, F, Y, X)
    num_classes: int,
    batch_level: bool = False,
) -> jnp.ndarray:
    """Type-matched pooling on the grid layout (reference models.py:122-129).

    Builds a per-(graph, type) mean table with one einsum and reads it back
    with a one-hot matmul — no gathers.
    """
    onehot_l = jax.nn.one_hot(local_type, num_classes, dtype=local_x.dtype)  # (B,NL,T)
    onehot_l = onehot_l * local_mask[..., None]
    sums = jnp.einsum("bnt,bnc->btc", onehot_l, local_x * local_mask[..., None])
    counts = jnp.sum(onehot_l, axis=1)  # (B, T)
    if batch_level:
        sums = jnp.sum(sums, axis=0, keepdims=True)  # (1, T, C)
        counts = jnp.sum(counts, axis=0, keepdims=True)
        table = sums / jnp.maximum(counts, 1.0)[..., None]
        table = table * (counts > 0)[..., None]
        table = jnp.broadcast_to(table, (local_x.shape[0],) + table.shape[1:])
    else:
        table = sums / jnp.maximum(counts, 1.0)[..., None]  # (B, T, C)
        table = table * (counts > 0)[..., None]
    onehot_v = jax.nn.one_hot(voxel_type, num_classes, dtype=local_x.dtype)  # (B,F,Y,X,T)
    return jnp.einsum("bfyxt,btc->bfyxc", onehot_v, table)
