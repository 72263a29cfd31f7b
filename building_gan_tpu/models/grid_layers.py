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
from ..ops.dropout import FastDropout
from ..ops.gemm_pack import PackedDense, packed_matmul


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

        # One-pass moments + scale/shift formulation.  The naive
        # subtract-then-square needs an extra full pass over x (and in bf16 a
        # materialized f32 copy — measured 10x slower than f32 on v5e); here
        # the f32 upcasts exist only INSIDE the reductions (XLA fuses them),
        # x is read twice and written once, all in its own dtype:
        #   mean  = E[x],  ex2 = E[x^2]           (masked, f32 accumulation)
        #   s     = mean * mean_scale
        #   var   = E[(x-s)^2] = ex2 - 2 s mean + s^2
        #   y     = (x - s) * w/std + b  ==  x * scale + shift
        m = mask.astype(jnp.float32)[..., None]
        xf = x.astype(jnp.float32)  # fused into the stat reductions

        if gid is not None and num_graphs > 1 and not self.batch_level:
            # per-(slot, building) stats keyed on the gid plane: one-hot
            # matmuls in the compute dtype with f32 accumulation (MXU rate),
            # on the flattened cell axis (works for 5-D and flat inputs)
            orig = x.shape
            B, C = x.shape[0], x.shape[-1]
            xr = x.reshape(B, -1, C)
            mr = m.reshape(B, -1, 1)
            gr = gid.reshape(B, -1)
            oh = jax.nn.one_hot(gr, num_graphs, dtype=x.dtype)  # (B,R,K)
            oh = oh * mr.astype(x.dtype)
            counts = jnp.maximum(jnp.sum(oh.astype(jnp.float32), axis=1), 1.0)
            s1 = jnp.einsum("brk,brc->bkc", oh, xr, preferred_element_type=jnp.float32)
            s2 = jnp.einsum(
                "brk,brc->bkc", oh, (xr * xr), preferred_element_type=jnp.float32
            )
            mean = s1 / counts[..., None]
            ex2 = s2 / counts[..., None]
            s = mean * mean_scale
            var = jnp.maximum(ex2 - 2.0 * s * mean + s * s, 0.0)
            inv = weight * jax.lax.rsqrt(var + self.eps)  # (B,K,C)
            scale = inv.astype(x.dtype)
            shift = (bias - s * inv).astype(x.dtype)
            # Apply via ONE joint dot on the MXU: (B,R,K) one-hot against the
            # concatenated (B,K,2C) scale/shift table.  History of this apply
            # (docs/PERF.md): two separate einsums lost to a fused broadcast-
            # multiply + K-reduce while the step was HBM-bound (the einsums
            # materialized two (B,R,C) temps per layer); after gap-free cell
            # packing the step became VPU-bound and the fused reduce showed up
            # as kLoop fusions at bw~0 — ~12% of the step across norm layers
            # x fwd/jvp/transpose — while the MXU sat 98% idle.  A single
            # dot_general moves those MACs to the MXU and halves the temp
            # traffic vs the two-einsum form.  oh is masked, so the shift
            # half vanishes on invalid cells.
            both = jnp.concatenate([scale, shift], axis=-1)  # (B,K,2C)
            t = jnp.einsum("brk,bkc->brc", oh, both)
            C_ = scale.shape[-1]
            return (xr * t[..., :C_] + t[..., C_:]).reshape(orig)

        if self.batch_level:
            axes = tuple(range(x.ndim - 1))  # all cell axes incl. batch
            denom = jnp.maximum(jnp.sum(mask), 1.0)
        else:
            axes = tuple(range(1, x.ndim - 1))  # per-graph cell axes
            denom = jnp.maximum(
                jnp.sum(mask, axis=tuple(range(1, mask.ndim))), 1.0
            ).reshape((-1,) + (1,) * (x.ndim - 2) + (1,))
        mean = jnp.sum(xf * m, axis=axes, keepdims=True) / denom
        ex2 = jnp.sum(xf * xf * m, axis=axes, keepdims=True) / denom
        s = mean * mean_scale
        var = jnp.maximum(ex2 - 2.0 * s * mean + s * s, 0.0)
        inv = weight * jax.lax.rsqrt(var + self.eps)
        scale = inv.astype(x.dtype)
        shift = (bias - s * inv).astype(x.dtype)
        return (x * scale + shift) * m.astype(x.dtype)


class _LinKernel(nn.Module):
    """Bare Dense(use_bias=False) kernel with the same param path/init as
    ``nn.Dense(name="lin")`` — exposed so callers can fold extra columns into
    one GEMM while keeping checkpoints/interop byte-compatible."""

    features: int

    @nn.compact
    def __call__(self, cin: int) -> jnp.ndarray:
        return self.param("kernel", nn.initializers.lecun_normal(), (cin, self.features))


class GridGATConv(nn.Module):
    """GAT over the 6-neighborhood; params match `layers.GATConv`."""

    features: int
    negative_slope: float = 0.2
    dtype: jnp.dtype = jnp.float32
    pack: bool = False

    @nn.compact
    def __call__(self, x, mask, grid_shape=None, gid=None):
        C = self.features
        W = _LinKernel(features=C, name="lin")(x.shape[-1])
        att_src = self.param("att_src", nn.initializers.glorot_uniform(), (C, 1))
        att_dst = self.param("att_dst", nn.initializers.glorot_uniform(), (C, 1))
        bias = self.param("bias", nn.initializers.zeros, (C,))

        # ONE MXU GEMM yields h AND both attention scores: a_src = (x@W)@att
        # = x@(W@att), so append W@att_src / W@att_dst as two extra output
        # columns.  The einsum alternative (h·att, output dim 1) lowers to a
        # VPU multiply-reduce — measured at several % of the train step
        # (docs/PERF.md §6); two extra GEMM columns are ~2% of its FLOPs and
        # ride the otherwise-idle MXU.  With ``pack``, narrow layers fold
        # rows into lanes (ops/gemm_pack.py) — the hourglass tail's GEMMs
        # under-fill 128x128 MXU tiles otherwise (docs/PERF.md §13.3).
        wa = jnp.concatenate([W, W @ att_src, W @ att_dst], axis=1).astype(self.dtype)
        if self.pack:
            ha = packed_matmul(x.astype(self.dtype), wa)
        else:
            ha = x.astype(self.dtype) @ wa
        h = ha[..., :C]
        a_src = ha[..., C].astype(jnp.float32)
        a_dst = ha[..., C + 1].astype(jnp.float32)
        if x.ndim == 3:  # flattened-row layout
            out = stencil.stencil_gat_flat(
                h, a_src, a_dst, mask, grid_shape, negative_slope=self.negative_slope, gid=gid
            )
        else:
            out = stencil.stencil_gat(
                h, a_src, a_dst, mask, negative_slope=self.negative_slope, gid=gid
            )
        return out + bias.astype(out.dtype)


class GridGATv2Conv(nn.Module):
    """GATv2 over the 6-neighborhood; params match `layers.GATv2Conv`."""

    features: int
    negative_slope: float = 0.2
    dtype: jnp.dtype = jnp.float32
    pack: bool = False

    @nn.compact
    def __call__(self, x, mask, grid_shape=None, gid=None):
        dense = PackedDense if self.pack else nn.Dense
        h_l = dense(self.features, use_bias=True, dtype=self.dtype, name="lin_l")(x)
        h_r = dense(self.features, use_bias=True, dtype=self.dtype, name="lin_r")(x)
        att = self.param("att", nn.initializers.glorot_uniform(), (self.features, 1))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        if x.ndim == 3:
            out = stencil.stencil_gatv2_flat(
                h_l, h_r, att[:, 0], mask, grid_shape, negative_slope=self.negative_slope, gid=gid
            )
        else:
            out = stencil.stencil_gatv2(
                h_l, h_r, att[:, 0], mask, negative_slope=self.negative_slope, gid=gid
            )
        return out + bias.astype(out.dtype)


class GridGCNConv(nn.Module):
    """GCN over the 6-neighborhood; params match `layers.GCNConv`."""

    features: int
    dtype: jnp.dtype = jnp.float32
    pack: bool = False

    @nn.compact
    def __call__(self, x, mask, grid_shape=None, gid=None):
        dense = PackedDense if self.pack else nn.Dense
        h = dense(self.features, use_bias=False, dtype=self.dtype, name="lin")(x)
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        if x.ndim == 3:
            out = stencil.stencil_gcn_flat(h, mask, grid_shape, gid=gid)
        else:
            out = stencil.stencil_gcn(h, mask, gid=gid)
        return out + bias.astype(out.dtype)


class GridGraphConv(nn.Module):
    """GraphConv over the 6-neighborhood; params match `layers.GraphConv`."""

    features: int
    dtype: jnp.dtype = jnp.float32
    pack: bool = False

    @nn.compact
    def __call__(self, x, mask, grid_shape=None, gid=None):
        dense = PackedDense if self.pack else nn.Dense
        h_nbr = dense(self.features, use_bias=False, dtype=self.dtype, name="lin_nbr")(x)
        if x.ndim == 3:
            agg = stencil.stencil_sum_flat(h_nbr, mask, grid_shape, gid=gid)
        else:
            agg = stencil.stencil_sum(h_nbr, mask, gid=gid)
        h_self = dense(self.features, use_bias=True, dtype=self.dtype, name="lin_self")(x)
        return h_self + agg


GRID_CONV_REGISTRY = {
    "GCNCONV": GridGCNConv,
    "GRAPHCONV": GridGraphConv,
    "GATCONV": GridGATConv,
    "GATV2CONV": GridGATv2Conv,
}


def hourglass_channels(hidden_dim: int, repeat: int, min_channels: int = 1) -> list[int]:
    """The hourglass channel schedule (reference models.py:68-90): ``repeat``
    halvings then ``repeat`` doublings, each entry clamped at
    ``min_channels`` (config.HOURGLASS_MIN_CHANNELS; 1 = reference-exact).
    The final entry always recovers ``hidden_dim`` since doubling ends there.

    ``min_channels`` must lie in [1, hidden_dim]: above ``hidden_dim`` the
    clamp would also widen the recovery tail, so the stack would exit at
    ``min_channels`` features and break every caller that reshapes back to
    ``hidden_dim`` (ADVICE r4).  This is THE schedule — the fused Pallas
    packing derives its (C_in, C_out) pairs from it
    (`ops.pallas.hourglass.hourglass_channel_pairs`).
    """
    if not 1 <= min_channels <= hidden_dim:
        raise ValueError(
            f"HOURGLASS_MIN_CHANNELS must be in [1, hidden_dim={hidden_dim}], "
            f"got {min_channels}"
        )
    channels = []
    c = hidden_dim
    for _ in range(repeat):
        c //= 2
        channels.append(max(c, min_channels))
    for _ in range(repeat):
        c *= 2
        channels.append(max(c, min_channels))
    return channels


class GridHourglass(nn.Module):
    """Hourglass stencil-conv stack; params match `layers.HourglassGNN`."""

    conv_type: str
    hidden_dim: int
    repeat: int
    dropout_rate: float = 0.2
    batch_level_graphnorm: bool = False
    dtype: jnp.dtype = jnp.float32
    pack: bool = False
    min_channels: int = 1  # config.HOURGLASS_MIN_CHANNELS

    @nn.compact
    def __call__(
        self, x, mask, deterministic: bool, gid=None, num_graphs: int = 1, grid_shape=None
    ):
        # flattened-row fast path: collapse (F, Y, X) -> R once for the whole
        # stack (see ops/stencil.py "Flattened-row layout"); 5-D callers get
        # their shape back at exit
        orig_shape = None
        if x.ndim == 5:
            orig_shape = x.shape
            grid_shape = x.shape[1:4]
            B = x.shape[0]
            x = x.reshape(B, -1, x.shape[-1])
            mask = mask.reshape(B, -1)
            gid = None if gid is None else gid.reshape(B, -1)
        conv_cls = GRID_CONV_REGISTRY[self.conv_type]
        channels = hourglass_channels(self.hidden_dim, self.repeat, self.min_channels)

        for i, ch in enumerate(channels):
            x = conv_cls(features=ch, dtype=self.dtype, pack=self.pack, name=f"conv_{i}")(
                x, mask, grid_shape=grid_shape, gid=gid
            )
            x = GridGraphNorm(
                features=ch,
                batch_level=self.batch_level_graphnorm,
                dtype=self.dtype,
                name=f"norm_{i}",
            )(x, mask, gid=gid, num_graphs=num_graphs)
            x = nn.relu(x)
            x = FastDropout(rate=self.dropout_rate)(x, deterministic)
        if orig_shape is not None:
            x = x.reshape(orig_shape)
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
    B = voxel_type.shape[0]
    cells = voxel_type.shape[1:]  # (F, Y, X) or (R,)
    C = local_x.shape[-1]

    if gid is not None and num_graphs > 1 and not batch_level:
        # joint (building, type) key: one-hot over K*T channels
        kt = num_graphs * num_classes
        key_l = local_gid * num_classes + local_type
        onehot_l = jax.nn.one_hot(key_l, kt, dtype=local_x.dtype)  # (B,NL,KT)
        onehot_l = onehot_l * local_mask[..., None].astype(local_x.dtype)
        sums = jnp.einsum(
            "bnt,bnc->btc", onehot_l, local_x, preferred_element_type=jnp.float32
        )
        counts = jnp.sum(onehot_l.astype(jnp.float32), axis=1)  # (B, KT)
        table = sums / jnp.maximum(counts, 1.0)[..., None]
        table = (table * (counts > 0)[..., None]).astype(local_x.dtype)
        key_v = (gid * num_classes + voxel_type).reshape(B, -1)
        # table readback as a dot_general (MXU): the fused broadcast-multiply
        # + KT-reduce form did KT(=42) VPU MACs per output element at bw~0
        # (same kLoop pathology as the keyed-norm apply, docs/PERF.md §6)
        onehot_v = jax.nn.one_hot(key_v, kt, dtype=local_x.dtype)  # (B,R,KT)
        out = jnp.einsum("brt,btc->brc", onehot_v, table)
        return out.reshape((B,) + cells + (C,))

    onehot_l = jax.nn.one_hot(local_type, num_classes, dtype=local_x.dtype)  # (B,NL,T)
    onehot_l = onehot_l * local_mask[..., None].astype(local_x.dtype)
    sums = jnp.einsum(
        "bnt,bnc->btc", onehot_l, local_x, preferred_element_type=jnp.float32
    )
    counts = jnp.sum(onehot_l.astype(jnp.float32), axis=1)  # (B, T)
    if batch_level:
        sums = jnp.sum(sums, axis=0, keepdims=True)  # (1, T, C)
        counts = jnp.sum(counts, axis=0, keepdims=True)
        table = sums / jnp.maximum(counts, 1.0)[..., None]
        table = table * (counts > 0)[..., None]
        table = jnp.broadcast_to(table, (local_x.shape[0],) + table.shape[1:])
    else:
        table = sums / jnp.maximum(counts, 1.0)[..., None]  # (B, T, C)
        table = table * (counts > 0)[..., None]
    table = table.astype(local_x.dtype)
    onehot_v = jax.nn.one_hot(
        voxel_type.reshape(B, -1), num_classes, dtype=local_x.dtype
    )  # (B,R,T)
    out = jnp.einsum("brt,btc->brc", onehot_v, table)
    return out.reshape((B,) + cells + (C,))
