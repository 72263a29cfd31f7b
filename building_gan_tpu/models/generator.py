"""Voxel GNN generator — graph-conditioned program-type label generator.

TPU-native re-design of the reference generator
(`building_gan/src/models.py:14-155`): identical computation graph — type-
matched pooling, local-feature MLP encoder, combined MLP encoder, hourglass
GNN over the voxel graph, skip-concat decoder, straight-through Gumbel head —
expressed over a static-shape :class:`PackedBatch` so a single XLA program
covers the whole run.

Differences from the reference (deliberate, flag-gated):
- matched pooling is per-graph by default (quirk Q1; ``batch_level_matching``
  restores reference behavior);
- GraphNorm statistics are per-graph by default (quirk Q5;
  ``batch_level_graphnorm`` restores reference behavior);
- noise / Gumbel / dropout randomness comes from explicit PRNG keys.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from ..config import Configuration, NUM_CLASSES
from ..ops.gumbel import gumbel_softmax_st
from ..ops.pooling import type_matched_pooling
from .layers import HourglassGNN, MLPBlock


class VoxelGNNGenerator(nn.Module):
    """Generator: (packed batch, z) -> (logits, label_hard, label_soft).

    Matches the reference constructor surface
    ``VoxelGNNGenerator(configuration, local_graph_dim, voxel_graph_dim)``
    (`models.py:15`); feature dims are taken from the batch at trace time.
    """

    configuration: Configuration
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, batch, z: jnp.ndarray, deterministic: bool = False):
        cfg = self.configuration
        dtype = cfg.compute_dtype if self.dtype is None else self.dtype
        num_graphs = batch.graph_mask.shape[0]

        # (a) cross-graph type-matched pooling (reference models.py:122-129)
        matched_x = type_matched_pooling(
            batch.local_x,
            batch.local_type,
            batch.local_graph_id,
            batch.local_mask,
            batch.voxel_type,
            batch.voxel_graph_id,
            num_graphs,
            batch_level=cfg.BATCH_LEVEL_MATCHING,
        )

        # (b) local-feature MLP encoder: 17 -> 128, 5 blocks (models.py:33-47)
        h = matched_x.astype(dtype)
        for i in range(1 + cfg.LOCAL_GRAPH_ENCODER_REPEAT):
            h = MLPBlock(cfg.LOCAL_ENCODER_HIDDEN_DIM, dtype=dtype, name=f"matched_enc_{i}")(h)
        encoded_matched = h

        # (c) combined MLP encoder: [enc(128), voxel.x(12), z(128)] -> 128
        # (models.py:49-66, 135-143)
        voxel_x = batch.voxel_x.astype(dtype)
        z = z.astype(dtype)
        x = jnp.concatenate([encoded_matched, voxel_x, z], axis=-1)
        for i in range(1 + cfg.GENERATOR_MLP_ENCODER_REPEAT):
            x = MLPBlock(cfg.GENERATOR_HIDDEN_DIM, dtype=dtype, name=f"mlp_enc_{i}")(x)

        # (d) hourglass GNN over the voxel graph (models.py:68-90, 144)
        encoded = HourglassGNN(
            conv_type=cfg.GENERATOR_CONV_TYPE,
            hidden_dim=cfg.GENERATOR_HIDDEN_DIM,
            repeat=cfg.GENERATOR_ENCODER_REPEAT,
            dropout_rate=cfg.ENCODER_DROPOUT_RATE,
            batch_level_graphnorm=cfg.BATCH_LEVEL_GRAPHNORM,
            min_channels=cfg.HOURGLASS_MIN_CHANNELS,
            dtype=dtype,
            name="encoder",
        )(
            x,
            batch.voxel_src,
            batch.voxel_dst,
            batch.voxel_edge_mask,
            batch.voxel_graph_id,
            num_graphs + 1,  # +1 dummy segment for padded nodes
            batch.voxel_mask,
            deterministic,
        )

        # (e) skip-concat decoder: 524 -> 7 logits (models.py:92-113, 146-148)
        final = jnp.concatenate([encoded, x, encoded_matched, voxel_x, z], axis=-1)
        d = cfg.GENERATOR_HIDDEN_DIM
        out = final
        for i, feat in enumerate([d, d // 2, d // 4, d // 8]):
            out = MLPBlock(feat, dtype=dtype, name=f"dec_{i}")(out)
        logits = nn.Dense(NUM_CLASSES, dtype=dtype, name="dec_out")(out)
        logits = logits.astype(jnp.float32)  # head math (softmax/CE/Gumbel) in f32

        # (f) ST-Gumbel head (models.py:150-154)
        key = self.make_rng("gumbel")
        label_hard, label_soft = gumbel_softmax_st(logits, key, tau=1.0)
        return logits, label_hard, label_soft
