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

    Parameter-compatible with `layers.GraphNorm`.  With multi-building slots
    (``gid`` given, K>1), statistics are per (slot, building) via one-hot
    matmuls over the gid plane — still gather-free.
    """

    features: int
    eps: float = 1e-5
    batch_level: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        mask: jnp.ndarray,
        gid: jnp.ndarray | None = None,
        num_graphs: int = 1,
    ) -> jnp.ndarray:
        weight = self.param("weight", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mean_scale = self.param("mean_scale", nn.initializers.ones, (self.features,))

        out_dtype = x.dtype
        x = x.astype(jnp.float32)  # stats in f32 regardless of compute dtype
        m = mask.astype(jnp.float32)[..., None]
        if self.batch_level:
            denom = jnp.maximum(jnp.sum(mask), 1.0)
            axes = tuple(range(x.ndim - 1))  # all cell axes incl. batch
            mean = jnp.sum(x * m, axis=axes, keepdims=True) / denom
            out = x - mean * mean_scale
            var = jnp.sum((out * out) * m, axis=axes, keepdims=True) / denom
        elif gid is not None and num_graphs > 1:
            # per-(slot, building) stats keyed on the gid plane
            oh = jax.nn.one_hot(gid, num_graphs, dtype=jnp.float32)  # (B,F,Y,X,K)
            oh = oh * m
            counts = jnp.maximum(jnp.sum(oh, axis=(1, 2, 3)), 1.0)  # (B,K)
            sums = jnp.einsum("bfyxk,bfyxc->bkc", oh, x)
            mean = sums / counts[..., None]
            mean_cell = jnp.einsum("bfyxk,bkc->bfyxc", oh, mean)
            out = x - mean_cell * mean_scale
            var = jnp.einsum("bfyxk,bfyxc->bkc", oh, out * out) / counts[..., None]
            var = jnp.einsum("bfyxk,bkc->bfyxc", oh, var)
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
        return ((weight * out / std + bias) * m).astype(out_dtype)


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

        a_src = jnp.einsum(
            "...c,cd->...d", h, att_src.astype(h.dtype), preferred_element_type=jnp.float32
        )[..., 0]
        a_dst = jnp.einsum(
            "...c,cd->...d", h, att_dst.astype(h.dtype), preferred_element_type=jnp.float32
        )[..., 0]
        out = stencil.stencil_gat(h, a_src, a_dst, mask, negative_slope=self.negative_slope)
        return out + bias.astype(out.dtype)


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
        return out + bias.astype(out.dtype)


class GridGCNConv(nn.Module):
    """GCN over the 6-neighborhood; params match `layers.GCNConv`."""

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask):
        h = nn.Dense(self.features, use_bias=False, dtype=self.dtype, name="lin")(x)
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        out = stencil.stencil_gcn(h, mask)
        return out + bias.astype(out.dtype)


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
    def __call__(self, x, mask, deterministic: bool, gid=None, num_graphs: int = 1):
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
            )(x, mask, gid=gid, num_graphs=num_graphs)
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
    local_gid: jnp.ndarray | None = None,  # (B, NL) building index within slot
    gid: jnp.ndarray | None = None,  # (B, F, Y, X)
    num_graphs: int = 1,
) -> jnp.ndarray:
    """Type-matched pooling on the grid layout (reference models.py:122-129).

    Builds a per-(graph, type) mean table with one einsum and reads it back
    with a one-hot matmul — no gathers.  Multi-building slots key the table
    jointly on (building, type) via the gid planes.
    """
    if gid is not None and num_graphs > 1 and not batch_level:
        # joint (building, type) key: one-hot over K*T channels
        kt = num_graphs * num_classes
        key_l = local_gid * num_classes + local_type
        onehot_l = jax.nn.one_hot(key_l, kt, dtype=local_x.dtype)  # (B,NL,KT)
        onehot_l = onehot_l * local_mask[..., None]
        sums = jnp.einsum("bnt,bnc->btc", onehot_l, local_x * local_mask[..., None])
        counts = jnp.sum(onehot_l, axis=1)  # (B, KT)
        table = sums / jnp.maximum(counts, 1.0)[..., None]
        table = table * (counts > 0)[..., None]
        key_v = gid * num_classes + voxel_type
        onehot_v = jax.nn.one_hot(key_v, kt, dtype=local_x.dtype)  # (B,F,Y,X,KT)
        return jnp.einsum("bfyxt,btc->bfyxc", onehot_v, table)

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
