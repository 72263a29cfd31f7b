"""Fast generator inference: fused Pallas hourglass + flax heads.

Reproduces ``GridVoxelGNNGenerator.__call__`` (deterministic) with the
hourglass conv stack replaced by the single fused Pallas kernel
(`ops/pallas/hourglass.py`).  Uses the SAME parameter pytree as the flax
model — weights are packed once via :func:`prepare` and reused across calls.

Note on numerics: the fused kernel computes its GEMMs in full f32
(``Precision.HIGHEST``); the XLA path uses the TPU default (bfloat16 inputs,
f32 accumulate), so outputs differ by ~bf16 epsilon per layer.  The kernel is
the *more* precise of the two.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..config import Configuration, NUM_CLASSES
from ..ops.gumbel import gumbel_softmax_st
from ..ops.pallas.hourglass import hourglass_fwd, pack_gat_weights
from .grid_layers import grid_type_matched_pooling
from .layers import MLPBlock


def prepare(params: dict, cfg: Configuration):
    """Pack hourglass weights once.  Returns opaque state for `infer`."""
    assert cfg.GENERATOR_CONV_TYPE == "GATCONV", "fused kernel supports GATCONV"
    Ws, atts, vecs = pack_gat_weights(
        jax.device_get(params["encoder"]),
        cfg.GENERATOR_HIDDEN_DIM,
        cfg.GENERATOR_ENCODER_REPEAT,
        min_channels=cfg.HOURGLASS_MIN_CHANNELS,
    )
    return {"Ws": Ws, "atts": atts, "vecs": vecs}


def infer(
    params: dict,
    packed: dict,
    cfg: Configuration,
    batch,
    z: jnp.ndarray,
    key: jax.Array,
    tile: int = 8,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(logits, label_hard, label_soft) — generator forward, fused hourglass."""
    matched_x = grid_type_matched_pooling(
        batch.local_x, batch.local_type, batch.local_mask, batch.type,
        NUM_CLASSES, batch_level=cfg.BATCH_LEVEL_MATCHING,
    )

    h = matched_x
    for i in range(1 + cfg.LOCAL_GRAPH_ENCODER_REPEAT):
        h = MLPBlock(cfg.LOCAL_ENCODER_HIDDEN_DIM).apply(
            {"params": params[f"matched_enc_{i}"]}, h
        )
    encoded_matched = h

    x = jnp.concatenate([encoded_matched, batch.x, z], axis=-1)
    for i in range(1 + cfg.GENERATOR_MLP_ENCODER_REPEAT):
        x = MLPBlock(cfg.GENERATOR_HIDDEN_DIM).apply({"params": params[f"mlp_enc_{i}"]}, x)

    encoded = hourglass_fwd(
        x, batch.mask, packed["Ws"], packed["atts"], packed["vecs"],
        hidden_dim=cfg.GENERATOR_HIDDEN_DIM, repeat=cfg.GENERATOR_ENCODER_REPEAT,
        tile=tile, interpret=interpret, gid=batch.gid,
        min_channels=cfg.HOURGLASS_MIN_CHANNELS,
    )

    final = jnp.concatenate([encoded, x, encoded_matched, batch.x, z], axis=-1)
    d = cfg.GENERATOR_HIDDEN_DIM
    out = final
    for i, feat in enumerate([d, d // 2, d // 4, d // 8]):
        out = MLPBlock(feat).apply({"params": params[f"dec_{i}"]}, out)
    kernel = params["dec_out"]["kernel"]
    bias = params["dec_out"]["bias"]
    logits = out @ kernel + bias

    label_hard, label_soft = gumbel_softmax_st(logits, key, tau=1.0)
    return logits, label_hard, label_soft
