"""Voxel GNN discriminator / WGAN critic.

TPU-native re-design of the reference discriminator
(`building_gan/src/models.py:158-245`): type-matched pooling, 36-dim input
concat, ReLU MLP encoder, 3-level hourglass GNN, per-voxel-node critic scores
(no graph-level readout — quirk Q10).  Sigmoid is appended only for the
non-WGAN-GP path (`models.py:222-224`).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from ..config import Configuration
from ..ops.pooling import type_matched_pooling
from .layers import HourglassGNN


class VoxelGNNDiscriminator(nn.Module):
    """Critic: (packed batch, label one-hot) -> per-voxel-node score (NV, 1)."""

    configuration: Configuration
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, batch, label: jnp.ndarray, deterministic: bool = False):
        cfg = self.configuration
        dtype = cfg.compute_dtype if self.dtype is None else self.dtype
        num_graphs = batch.graph_mask.shape[0]

        # type-matched pooling (reference models.py:230-237)
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

        # input concat [matched(17), voxel.x(12), label(7)] = 36 -> MLP 64
        # (models.py:177-185, 239-240)
        x = jnp.concatenate(
            [matched_x.astype(dtype), batch.voxel_x.astype(dtype), label.astype(dtype)],
            axis=-1,
        )
        x = nn.relu(nn.Dense(cfg.DISCRIMINATOR_HIDDEN_DIM, dtype=dtype, name="mlp_0")(x))
        x = nn.relu(nn.Dense(cfg.DISCRIMINATOR_HIDDEN_DIM, dtype=dtype, name="mlp_1")(x))

        # hourglass GNN 64->32->16->8->...->64 (models.py:187-210)
        encoded = HourglassGNN(
            conv_type=cfg.DISCRIMINATOR_CONV_TYPE,
            hidden_dim=cfg.DISCRIMINATOR_HIDDEN_DIM,
            repeat=cfg.DISCRIMINATOR_ENCODER_REPEAT,
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
            num_graphs + 1,
            batch.voxel_mask,
            deterministic,
        )

        # decoder 64->32->16->8->1, per-node scores (models.py:212-225, 242-245)
        d = cfg.DISCRIMINATOR_HIDDEN_DIM
        out = encoded
        for i, feat in enumerate([d // 2, d // 4, d // 8]):
            out = nn.relu(nn.Dense(feat, dtype=dtype, name=f"dec_{i}")(out))
        # critic scores in f32: WGAN means/GP norms need exact accumulation
        score = nn.Dense(1, dtype=dtype, name="dec_out")(out).astype(jnp.float32)
        if not cfg.USE_WGANGP:
            score = nn.sigmoid(score)
        return score
