"""Grid-layout generator and discriminator — the TPU flagship models.

Same computation graph as the edge-list models (`generator.py`,
`discriminator.py` — themselves re-designs of reference `models.py:14-245`)
over the dense ``(B, F, Y, X, C)`` layout, with IDENTICAL parameter trees so
one checkpoint drives either path.  All message passing is stencil-based
(`ops.stencil`); pooling and norms are dense einsums — zero gather/scatter.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

import jax

from ..config import Configuration, NUM_CLASSES
from ..ops.gemm_pack import PackedDense
from ..ops.gumbel import gumbel_softmax_st
from .grid_layers import GridHourglass, grid_type_matched_pooling
from .layers import MLPBlock


def _hourglass_cls(cfg: Configuration):
    """GridHourglass, optionally remat-wrapped (config.REMAT_HOURGLASS).

    ``dots_saveable`` keeps GEMM outputs as residuals and recomputes the
    elementwise tail (norm/attention/relu/dropout) in the backward passes —
    trading VPU recompute for the HBM writes+reads of those intermediates
    (docs/PERF.md §10).  static_argnums: deterministic / num_graphs /
    grid_shape are python values, not tracers.
    """
    if not getattr(cfg, "REMAT_HOURGLASS", False):
        return GridHourglass
    return nn.remat(
        GridHourglass,
        policy=jax.checkpoint_policies.dots_saveable,
        static_argnums=(3, 5, 6),  # deterministic, num_graphs, grid_shape
    )


class GridVoxelGNNGenerator(nn.Module):
    """Generator over a :class:`GridBatch`: -> (logits, label_hard, label_soft).

    Compute dtype follows ``configuration.COMPUTE_DTYPE`` (bf16 by default —
    the MXU fast path); parameters stay float32.  Pass ``dtype`` explicitly to
    override (e.g. float32 for strict parity tests).
    """

    configuration: Configuration
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, batch, z: jnp.ndarray, deterministic: bool = False):
        cfg = self.configuration
        dtype = cfg.compute_dtype if self.dtype is None else self.dtype

        # flattened-row layout throughout (ops/stencil.py "Flattened-row
        # layout"): (B, F, Y, X, .) -> (B, R, .) removes the TPU tile padding
        # of small spatial minor dims; only the returned tensors are grid-
        # shaped again
        B = batch.x.shape[0]
        grid_shape = batch.x.shape[1:4]
        # narrow-GEMM row folding (ops/gemm_pack.py, docs/PERF.md §13.3):
        # the hourglass tail and decoder run thin GEMMs that under-fill
        # 128x128 MXU tiles; pack folds rows into lanes, same math.
        pack = getattr(cfg, "PACK_NARROW_GEMMS", False)
        dense = PackedDense if pack else nn.Dense
        voxel_x = batch.x.reshape(B, -1, batch.x.shape[-1]).astype(dtype)
        mask = batch.mask.reshape(B, -1)
        vtype = batch.type.reshape(B, -1)
        gid = None if batch.gid is None else batch.gid.reshape(B, -1)

        matched_x = grid_type_matched_pooling(
            batch.local_x.astype(dtype),
            batch.local_type,
            batch.local_mask,
            vtype,
            NUM_CLASSES,
            batch_level=cfg.BATCH_LEVEL_MATCHING,
            local_gid=batch.local_gid,
            gid=gid,
            num_graphs=batch.graphs_per_slot,
        )

        h = matched_x
        for i in range(1 + cfg.LOCAL_GRAPH_ENCODER_REPEAT):
            h = MLPBlock(
                cfg.LOCAL_ENCODER_HIDDEN_DIM, dtype=dtype, pack=pack, name=f"matched_enc_{i}"
            )(h)
        encoded_matched = h

        z = z.reshape(B, -1, z.shape[-1]).astype(dtype)
        x = jnp.concatenate([encoded_matched, voxel_x, z], axis=-1)
        for i in range(1 + cfg.GENERATOR_MLP_ENCODER_REPEAT):
            x = MLPBlock(cfg.GENERATOR_HIDDEN_DIM, dtype=dtype, pack=pack, name=f"mlp_enc_{i}")(x)

        encoded = _hourglass_cls(cfg)(
            conv_type=cfg.GENERATOR_CONV_TYPE,
            hidden_dim=cfg.GENERATOR_HIDDEN_DIM,
            repeat=cfg.GENERATOR_ENCODER_REPEAT,
            dropout_rate=cfg.ENCODER_DROPOUT_RATE,
            batch_level_graphnorm=cfg.BATCH_LEVEL_GRAPHNORM,
            min_channels=cfg.HOURGLASS_MIN_CHANNELS,
            dtype=dtype,
            pack=pack,
            name="encoder",
        )(
            x, mask, deterministic, gid, batch.graphs_per_slot, grid_shape,
        )

        final = jnp.concatenate([encoded, x, encoded_matched, voxel_x, z], axis=-1)
        d = cfg.GENERATOR_HIDDEN_DIM
        out = final
        for i, feat in enumerate([d, d // 2, d // 4, d // 8]):
            out = MLPBlock(feat, dtype=dtype, pack=pack, name=f"dec_{i}")(out)
        # head in f32: logits feed softmax/CE/Gumbel where bf16 rounding bites
        logits = dense(NUM_CLASSES, dtype=dtype, name="dec_out")(out)
        logits = logits.astype(jnp.float32)

        key = self.make_rng("gumbel")
        label_hard, label_soft = gumbel_softmax_st(logits, key, tau=1.0)
        shape5 = (B,) + grid_shape + (NUM_CLASSES,)
        return (
            logits.reshape(shape5),
            label_hard.reshape(shape5),
            label_soft.reshape(shape5),
        )


class GridVoxelGNNDiscriminator(nn.Module):
    """Critic over a :class:`GridBatch`: (batch, label) -> (B, F, Y, X, 1)."""

    configuration: Configuration
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, batch, label: jnp.ndarray, deterministic: bool = False):
        cfg = self.configuration
        dtype = cfg.compute_dtype if self.dtype is None else self.dtype

        B = batch.x.shape[0]
        grid_shape = batch.x.shape[1:4]
        pack = getattr(cfg, "PACK_NARROW_GEMMS", False)
        dense = PackedDense if pack else nn.Dense
        voxel_x = batch.x.reshape(B, -1, batch.x.shape[-1]).astype(dtype)
        mask = batch.mask.reshape(B, -1)
        vtype = batch.type.reshape(B, -1)
        gid = None if batch.gid is None else batch.gid.reshape(B, -1)
        label = label.reshape(B, -1, label.shape[-1]).astype(dtype)

        matched_x = grid_type_matched_pooling(
            batch.local_x.astype(dtype),
            batch.local_type,
            batch.local_mask,
            vtype,
            NUM_CLASSES,
            batch_level=cfg.BATCH_LEVEL_MATCHING,
            local_gid=batch.local_gid,
            gid=gid,
            num_graphs=batch.graphs_per_slot,
        )

        x = jnp.concatenate([matched_x, voxel_x, label], axis=-1)
        x = nn.relu(dense(cfg.DISCRIMINATOR_HIDDEN_DIM, dtype=dtype, name="mlp_0")(x))
        x = nn.relu(dense(cfg.DISCRIMINATOR_HIDDEN_DIM, dtype=dtype, name="mlp_1")(x))

        encoded = _hourglass_cls(cfg)(
            conv_type=cfg.DISCRIMINATOR_CONV_TYPE,
            hidden_dim=cfg.DISCRIMINATOR_HIDDEN_DIM,
            repeat=cfg.DISCRIMINATOR_ENCODER_REPEAT,
            dropout_rate=cfg.ENCODER_DROPOUT_RATE,
            batch_level_graphnorm=cfg.BATCH_LEVEL_GRAPHNORM,
            min_channels=cfg.HOURGLASS_MIN_CHANNELS,
            dtype=dtype,
            pack=pack,
            name="encoder",
        )(
            x, mask, deterministic, gid, batch.graphs_per_slot, grid_shape,
        )

        d = cfg.DISCRIMINATOR_HIDDEN_DIM
        out = encoded
        for i, feat in enumerate([d // 2, d // 4, d // 8]):
            out = nn.relu(dense(feat, dtype=dtype, name=f"dec_{i}")(out))
        # critic scores in f32: WGAN means/GP norms need exact accumulation
        score = dense(1, dtype=dtype, name="dec_out")(out).astype(jnp.float32)
        if not cfg.USE_WGANGP:
            score = nn.sigmoid(score)
        return score.reshape((B,) + grid_shape + (1,))
