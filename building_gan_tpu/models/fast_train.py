"""Fused TRAINING forwards: generator/discriminator with the custom-VJP
Pallas hourglass (`ops/pallas/gat_train.py`) replacing the XLA conv stack.

docs/PERF.md §4 lever 2: the WGAN-GP step is HBM-bandwidth-bound and the
hourglass layers are the bulk of the per-layer activation traffic.  These
functions reproduce `GridVoxelGNNGenerator.__call__` /
`GridVoxelGNNDiscriminator.__call__` (reference models.py:92-245 re-designed
for the grid layout) against the SAME parameter pytree, differentiably:
weight packing is pure jnp (pad + stack), so `jax.grad` flows through the
fused kernel's custom VJP back into the flax param tree.

Usage notes:

- the fused path is first-order differentiable (custom_vjp).  The WGAN-GP
  double-backward therefore keeps its GP critic pass on the XLA path
  (`train/step.py` passes a separate `d_apply` for it); real/fake critic
  passes and all generator passes run fused.
- hourglass dropout runs in-kernel (byte-threshold Bernoulli, reproducible
  fwd/bwd from per-layer seeds) — a different RNG STREAM than the flax
  path's threefry draws, same distribution.
- MLP encoder/decoder blocks and pooling stay XLA: they are single GEMMs
  with cheap elementwise tails that XLA already fuses well.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..config import Configuration, NUM_CLASSES
from ..ops.gumbel import gumbel_softmax_st
from ..ops.pallas.gat_train import (
    build_planes,
    hourglass_channel_pairs,
    hourglass_train,
)
from .grid_layers import grid_type_matched_pooling
from .layers import MLPBlock


def pack_gat_weights_jnp(
    enc_params: dict, hidden_dim: int, repeat: int, min_channels: int = 1
):
    """Differentiable (L, Cmax, ...) packing of a GridHourglass param subtree.

    Zero-padded exactly like `ops.pallas.hourglass.pack_gat_weights`, but in
    jnp so gradients flow back to the individual layer parameters.
    ``min_channels`` must match the flax stack's (ADVICE r4: a mismatched
    schedule pads/slices against the wrong per-layer shapes)."""
    chans = hourglass_channel_pairs(hidden_dim, repeat, min_channels)
    cmax = max(max(ci, co) for ci, co in chans)
    Ws, atts, vecs = [], [], []
    for l, (ci, co) in enumerate(chans):
        conv = enc_params[f"conv_{l}"]
        norm = enc_params[f"norm_{l}"]
        Ws.append(
            jnp.pad(
                conv["lin"]["kernel"].astype(jnp.float32),
                ((0, cmax - ci), (0, cmax - co)),
            )
        )
        pad1 = (0, cmax - co)
        atts.append(
            jnp.stack(
                [
                    jnp.pad(conv["att_src"][:, 0].astype(jnp.float32), pad1),
                    jnp.pad(conv["att_dst"][:, 0].astype(jnp.float32), pad1),
                ]
            )
        )
        vecs.append(
            jnp.stack(
                [
                    jnp.pad(conv["bias"].astype(jnp.float32), pad1),
                    jnp.pad(norm["weight"].astype(jnp.float32), pad1),
                    jnp.pad(norm["bias"].astype(jnp.float32), pad1),
                    jnp.pad(norm["mean_scale"].astype(jnp.float32), pad1),
                ]
            )
        )
    return jnp.stack(Ws), jnp.stack(atts), jnp.stack(vecs)


def _fused_hourglass(
    enc_params,
    x,
    planes,
    grid_shape,
    K,
    hidden_dim,
    repeat,
    dropout_rate,
    deterministic,
    key,
    tile,
    interpret,
    min_channels=1,
):
    Ws, atts, vecs = pack_gat_weights_jnp(enc_params, hidden_dim, repeat, min_channels)
    L = Ws.shape[0]
    if deterministic or key is None:
        seeds = jnp.zeros((L,), jnp.int32)
    else:
        seeds = jax.random.randint(key, (L,), 0, jnp.iinfo(jnp.int32).max, dtype=jnp.int32)
    return hourglass_train(
        x, planes, Ws, atts, vecs, seeds, grid_shape,
        K=K, dropout_rate=dropout_rate, deterministic=deterministic,
        tile=tile, interpret=interpret,
    )


def generator_apply_fused(
    params: dict,
    cfg: Configuration,
    batch,
    z: jnp.ndarray,
    key_gumbel: jax.Array,
    key_dropout: jax.Array | None,
    deterministic: bool = False,
    tile: int = 2,
    interpret: bool | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """`GridVoxelGNNGenerator.__call__` with the hourglass fused (train-capable)."""
    assert cfg.GENERATOR_CONV_TYPE == "GATCONV", "fused train path supports GATCONV"
    dtype = cfg.compute_dtype
    B = batch.x.shape[0]
    grid_shape = batch.x.shape[1:4]
    K = batch.graphs_per_slot
    voxel_x = batch.x.reshape(B, -1, batch.x.shape[-1]).astype(dtype)
    mask = batch.mask.reshape(B, -1)
    vtype = batch.type.reshape(B, -1)
    gid = None if batch.gid is None else batch.gid.reshape(B, -1)

    matched_x = grid_type_matched_pooling(
        batch.local_x.astype(dtype), batch.local_type, batch.local_mask,
        vtype, NUM_CLASSES, batch_level=cfg.BATCH_LEVEL_MATCHING,
        local_gid=batch.local_gid, gid=gid, num_graphs=K,
    )

    h = matched_x
    for i in range(1 + cfg.LOCAL_GRAPH_ENCODER_REPEAT):
        h = MLPBlock(cfg.LOCAL_ENCODER_HIDDEN_DIM, dtype=dtype).apply(
            {"params": params[f"matched_enc_{i}"]}, h
        )
    encoded_matched = h

    z = z.reshape(B, -1, z.shape[-1]).astype(dtype)
    x = jnp.concatenate([encoded_matched, voxel_x, z], axis=-1)
    for i in range(1 + cfg.GENERATOR_MLP_ENCODER_REPEAT):
        x = MLPBlock(cfg.GENERATOR_HIDDEN_DIM, dtype=dtype).apply(
            {"params": params[f"mlp_enc_{i}"]}, x
        )

    planes = build_planes(batch.mask, batch.gid, grid_shape)
    encoded = _fused_hourglass(
        params["encoder"], x, planes, grid_shape, K,
        cfg.GENERATOR_HIDDEN_DIM, cfg.GENERATOR_ENCODER_REPEAT,
        cfg.ENCODER_DROPOUT_RATE, deterministic, key_dropout, tile, interpret,
        min_channels=cfg.HOURGLASS_MIN_CHANNELS,
    ).astype(dtype)

    final = jnp.concatenate([encoded, x, encoded_matched, voxel_x, z], axis=-1)
    d = cfg.GENERATOR_HIDDEN_DIM
    out = final
    for i, feat in enumerate([d, d // 2, d // 4, d // 8]):
        out = MLPBlock(feat, dtype=dtype).apply({"params": params[f"dec_{i}"]}, out)
    logits = out @ params["dec_out"]["kernel"].astype(dtype) + params["dec_out"][
        "bias"
    ].astype(dtype)
    logits = logits.astype(jnp.float32)

    label_hard, label_soft = gumbel_softmax_st(logits, key_gumbel, tau=1.0)
    shape5 = (B,) + tuple(grid_shape) + (NUM_CLASSES,)
    return (
        logits.reshape(shape5),
        label_hard.reshape(shape5),
        label_soft.reshape(shape5),
    )


def discriminator_apply_fused(
    params: dict,
    cfg: Configuration,
    batch,
    label: jnp.ndarray,
    key_dropout: jax.Array | None,
    deterministic: bool = False,
    tile: int = 2,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """`GridVoxelGNNDiscriminator.__call__` with the hourglass fused.

    First-order differentiable only — the GP double-backward pass must use
    the XLA discriminator (see train/step.py)."""
    assert cfg.DISCRIMINATOR_CONV_TYPE == "GATCONV"
    dtype = cfg.compute_dtype
    B = batch.x.shape[0]
    grid_shape = batch.x.shape[1:4]
    K = batch.graphs_per_slot
    voxel_x = batch.x.reshape(B, -1, batch.x.shape[-1]).astype(dtype)
    vtype = batch.type.reshape(B, -1)
    gid = None if batch.gid is None else batch.gid.reshape(B, -1)
    label = label.reshape(B, -1, label.shape[-1]).astype(dtype)

    matched_x = grid_type_matched_pooling(
        batch.local_x.astype(dtype), batch.local_type, batch.local_mask,
        vtype, NUM_CLASSES, batch_level=cfg.BATCH_LEVEL_MATCHING,
        local_gid=batch.local_gid, gid=gid, num_graphs=K,
    )

    x = jnp.concatenate([matched_x, voxel_x, label], axis=-1)
    for name in ("mlp_0", "mlp_1"):
        x = jax.nn.relu(
            x @ params[name]["kernel"].astype(dtype) + params[name]["bias"].astype(dtype)
        )

    planes = build_planes(batch.mask, batch.gid, grid_shape)
    out = _fused_hourglass(
        params["encoder"], x, planes, grid_shape, K,
        cfg.DISCRIMINATOR_HIDDEN_DIM, cfg.DISCRIMINATOR_ENCODER_REPEAT,
        cfg.ENCODER_DROPOUT_RATE, deterministic, key_dropout, tile, interpret,
        min_channels=cfg.HOURGLASS_MIN_CHANNELS,
    ).astype(dtype)

    d = cfg.DISCRIMINATOR_HIDDEN_DIM
    for i, feat in enumerate([d // 2, d // 4, d // 8]):
        out = jax.nn.relu(
            out @ params[f"dec_{i}"]["kernel"].astype(dtype)
            + params[f"dec_{i}"]["bias"].astype(dtype)
        )
    score = (
        out @ params["dec_out"]["kernel"].astype(dtype)
        + params["dec_out"]["bias"].astype(dtype)
    ).astype(jnp.float32)
    if not cfg.USE_WGANGP:
        score = jax.nn.sigmoid(score)
    return score.reshape((B,) + tuple(grid_shape) + (1,))
