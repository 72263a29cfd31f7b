"""Grid graph-transformer generator — the stretch model family.

BASELINE.json config #5: "3D graph-transformer generator with global
attention over voxel nodes (new capability)" — no reference counterpart.
Replaces the hourglass message passing with masked multi-head self-attention
over each building's cells: every voxel attends to every other voxel of the
SAME building (padded cells masked out; buildings never attend across the
batch axis).  At reference scale a building has <= ~1.6k cells, so full
O(R^2) attention is tiny and MXU-friendly — (B, R, C) batched GEMMs,
no gather/scatter.

Architecture: pre-LN transformer blocks (MHA + GEGLU-free MLP), learned
3D positional encoding from the normalized (floor, y, x) location channels
already present in the voxel features, and the same matched-pooling
conditioning / skip-concat decoder / ST-Gumbel head as the GNN generator
(reference models.py:119-155 pipeline).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.dropout import FastDropout
from ..config import Configuration, NUM_CLASSES
from ..ops.gumbel import gumbel_softmax_st
from .grid_layers import grid_type_matched_pooling
from .layers import MLPBlock

_NEG_INF = -1e30


class GridSelfAttention(nn.Module):
    """Masked MHA over the flattened cell axis of one building."""

    dim: int
    heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
        # x: (B, R, C); mask: (B, R)
        b, r, c = x.shape
        head_dim = self.dim // self.heads
        qkv = nn.Dense(3 * self.dim, dtype=self.dtype, name="qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads_split(t):
            return t.reshape(b, r, self.heads, head_dim).transpose(0, 2, 1, 3)

        q, k, v = heads_split(q), heads_split(k), heads_split(v)
        scores = jnp.einsum(
            "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
        ) / jnp.sqrt(float(head_dim))
        scores = jnp.where(mask[:, None, None, :] > 0, scores, _NEG_INF)
        attn = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, r, self.dim)
        out = nn.Dense(self.dim, dtype=self.dtype, name="proj")(out)
        return out * mask[..., None]


class TransformerBlock(nn.Module):
    dim: int
    heads: int
    mlp_ratio: int = 4
    dropout_rate: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask, deterministic: bool):
        h = nn.LayerNorm(dtype=self.dtype, name="norm1")(x)
        h = GridSelfAttention(dim=self.dim, heads=self.heads, dtype=self.dtype, name="attn")(h, mask)
        h = FastDropout(rate=self.dropout_rate)(h, deterministic)
        x = x + h
        h = nn.LayerNorm(dtype=self.dtype, name="norm2")(x)
        h = nn.Dense(self.dim * self.mlp_ratio, dtype=self.dtype, name="mlp_in")(h)
        h = nn.gelu(h)
        h = nn.Dense(self.dim, dtype=self.dtype, name="mlp_out")(h)
        h = FastDropout(rate=self.dropout_rate)(h, deterministic)
        return (x + h) * mask[..., None]


class GridTransformerGenerator(nn.Module):
    """Generator with global attention: (batch, z) -> (logits, hard, soft)."""

    configuration: Configuration
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, batch, z: jnp.ndarray, deterministic: bool = False):
        cfg = self.configuration
        dtype = cfg.compute_dtype if self.dtype is None else self.dtype
        b, f, y, x_, _ = batch.x.shape
        r = f * y * x_

        matched_x = grid_type_matched_pooling(
            batch.local_x.astype(dtype), batch.local_type, batch.local_mask,
            batch.type, NUM_CLASSES, batch_level=cfg.BATCH_LEVEL_MATCHING,
        )

        h = matched_x
        for i in range(1 + cfg.LOCAL_GRAPH_ENCODER_REPEAT):
            h = MLPBlock(cfg.LOCAL_ENCODER_HIDDEN_DIM, dtype=dtype, name=f"matched_enc_{i}")(h)
        encoded_matched = h

        voxel_x = batch.x.astype(dtype)
        zc = z.astype(dtype)
        tokens = jnp.concatenate([encoded_matched, voxel_x, zc], axis=-1)
        for i in range(1 + cfg.GENERATOR_MLP_ENCODER_REPEAT):
            tokens = MLPBlock(cfg.GENERATOR_HIDDEN_DIM, dtype=dtype, name=f"mlp_enc_{i}")(tokens)

        # flatten cells to the token axis; learned positional projection of the
        # normalized (coord, dim, loc) channels already in voxel_x
        tok = tokens.reshape(b, r, cfg.GENERATOR_HIDDEN_DIM)
        pos = nn.Dense(cfg.GENERATOR_HIDDEN_DIM, dtype=dtype, name="pos_proj")(
            voxel_x.reshape(b, r, -1)
        )
        tok = tok + pos
        mask_flat = batch.mask.reshape(b, r)

        for i in range(cfg.TRANSFORMER_LAYERS):
            tok = TransformerBlock(
                dim=cfg.GENERATOR_HIDDEN_DIM,
                heads=cfg.TRANSFORMER_HEADS,
                dropout_rate=cfg.ENCODER_DROPOUT_RATE,
                dtype=dtype,
                name=f"block_{i}",
            )(tok, mask_flat, deterministic)

        encoded = tok.reshape(b, f, y, x_, cfg.GENERATOR_HIDDEN_DIM)

        final = jnp.concatenate([encoded, tokens, encoded_matched, voxel_x, zc], axis=-1)
        d = cfg.GENERATOR_HIDDEN_DIM
        out = final
        for i, feat in enumerate([d, d // 2, d // 4, d // 8]):
            out = MLPBlock(feat, dtype=dtype, name=f"dec_{i}")(out)
        logits = nn.Dense(NUM_CLASSES, dtype=dtype, name="dec_out")(out)
        logits = logits.astype(jnp.float32)  # head math in f32

        key = self.make_rng("gumbel")
        label_hard, label_soft = gumbel_softmax_st(logits, key, tau=1.0)
        return logits, label_hard, label_soft
