"""WGAN-GP and auxiliary losses, layout-generic (packed edge-list OR grid).

Re-implements the reference loss stack (`building_gan/src/trainer.py:291-385`)
with explicit masking for static-shape padding:

- D loss: ``mean(D(fake)) - mean(D(real)) + GP`` where means run over real
  voxel cells only (the reference critic emits per-node scores — quirk Q10).
- Gradient penalty: per-node eps ~ U[0,1] interpolation on the one-hot label
  simplex, gradient of the summed critic output w.r.t. the interpolated
  labels, ``mean((||grad||_2 - 1)^2) * lambda_gp`` (reference
  `trainer.py:291-316`).  ``jax.grad`` of the scalarized critic expresses the
  double-backward natively.
- G loss: ``lambda_adv * (-mean(D(fake))) + lambda_label * CE +
  lambda_ratio * MSE(ratio[:-2]) + lambda_ratio_void * MSE(ratio[-2:]) +
  lambda_far * MSE(FAR_gen, FAR)`` (reference `trainer.py:334-385`).  Ratios
  are merged-batch like the reference (`trainer.py:348-349`); the [-2:] split
  is quirk Q4.  The FAR term uses hard labels and carries no gradient in the
  reference (quirk Q3) — mirrored with an explicit ``stop_gradient``.
- BCE path for ``USE_WGANGP=False`` (reference `trainer.py:326-341`).

Layout dispatch: a batch with per-cell label tensors of rank > 2 is the dense
grid layout (per-graph reductions are dense axis sums); rank-2 labels mean
the packed node-list layout (per-graph reductions are segment ops).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from ..config import Configuration, NUM_CLASSES, VOID
from ..ops.rng import bulk_key


def masked_mean(values: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Mean over entries where mask==1.  ``values`` may carry one trailing
    feature axis beyond ``mask``'s shape (it is summed per entry).  Always
    accumulates in float32 (compute dtype may be bf16)."""
    values = values.astype(jnp.float32)
    if values.ndim == mask.ndim + 1:
        values = values.sum(axis=-1)
    values = jnp.where(mask > 0, values, 0.0)
    return values.sum() / jnp.maximum(mask.sum(), 1.0)


def gradient_penalty(
    d_apply: Callable[[jnp.ndarray], jnp.ndarray],
    types_onehot: jnp.ndarray,  # (..., 7) real labels
    label_soft: jnp.ndarray,  # (..., 7) generated soft labels
    voxel_mask: jnp.ndarray,  # (...)
    key: jax.Array,
    lambda_gp: float,
) -> jnp.ndarray:
    """WGAN-GP on the label simplex (reference trainer.py:291-316)."""
    eps = jax.random.uniform(
        bulk_key(key), voxel_mask.shape + (1,), dtype=types_onehot.dtype
    )
    interpolated = eps * types_onehot + (1.0 - eps) * label_soft

    def scalarized(x):
        scores = d_apply(x)  # (..., 1) per-cell critic scores
        return jnp.sum(scores[..., 0] * voxel_mask)

    grads = jax.grad(scalarized)(interpolated)  # (..., 7)
    norms = jnp.sqrt(jnp.sum(grads * grads, axis=-1) + 1e-12)
    penalty = masked_mean((norms - 1.0) ** 2, voxel_mask)
    return penalty * lambda_gp


def discriminator_loss(
    d_apply: Callable[[jnp.ndarray], jnp.ndarray],  # label -> (..., 1) scores
    types_onehot: jnp.ndarray,
    label_hard: jnp.ndarray,
    label_soft: jnp.ndarray,
    voxel_mask: jnp.ndarray,
    key: jax.Array,
    cfg: Configuration,
    d_apply_gp: Callable[[jnp.ndarray], jnp.ndarray] | None = None,
) -> jnp.ndarray:
    """Critic loss (reference trainer.py:318-332).

    ``d_apply_gp`` (default: ``d_apply``) is the critic used inside the
    gradient penalty, which is differentiated TWICE (once w.r.t. the
    interpolated label here, once more w.r.t. the critic parameters by the
    caller).  The fused Pallas critic (`models/fast_train.py`) is first-order
    (custom_vjp), so the fused train step passes the XLA critic for this term
    while real/fake passes run fused.
    """
    d_real = d_apply(types_onehot)
    d_fake = d_apply(label_hard)
    if cfg.USE_WGANGP:
        loss = masked_mean(d_fake, voxel_mask) - masked_mean(d_real, voxel_mask)
        loss += gradient_penalty(
            d_apply_gp or d_apply, types_onehot, label_soft, voxel_mask, key, cfg.LAMBDA_GP
        )
    else:
        eps = 1e-7
        d_real_c = jnp.clip(d_real, eps, 1 - eps)
        d_fake_c = jnp.clip(d_fake, eps, 1 - eps)
        loss_real = masked_mean(-jnp.log(d_real_c), voxel_mask)
        loss_fake = masked_mean(-jnp.log(1 - d_fake_c), voxel_mask)
        loss = loss_fake + loss_real
    return loss


def _batch_fields(batch):
    """(types, mask, is_grid) for either layout."""
    if hasattr(batch, "grid_shape"):  # GridBatch
        return batch.type, batch.mask, True
    return batch.voxel_type, batch.voxel_mask, False


def generator_loss(
    d_apply: Callable[[jnp.ndarray], jnp.ndarray],
    batch,
    logits: jnp.ndarray,
    label_hard: jnp.ndarray,
    cfg: Configuration,
) -> tuple[jnp.ndarray, dict]:
    """Generator loss + aux dict (reference trainer.py:334-385)."""
    types, voxel_mask, is_grid = _batch_fields(batch)
    types_onehot = jax.nn.one_hot(types, NUM_CLASSES, dtype=logits.dtype)
    types_onehot = types_onehot * voxel_mask[..., None]

    d_fake = d_apply(label_hard)
    if cfg.USE_WGANGP:
        g_loss_adv = -masked_mean(d_fake, voxel_mask)
    else:
        eps = 1e-7
        g_loss_adv = masked_mean(-jnp.log(jnp.clip(d_fake, eps, 1 - eps)), voxel_mask)
    g_loss_adv = g_loss_adv * cfg.LAMBDA_ADV

    # cross entropy vs ground-truth types (lambda 0.0 in the reference config)
    logp = jax.nn.log_softmax(logits, axis=-1)
    ce = -jnp.sum(types_onehot * logp, axis=-1)
    g_loss_label = masked_mean(ce, voxel_mask) * cfg.LAMBDA_LABEL

    # merged-batch program-type ratio match (reference trainer.py:348-355)
    n_real = jnp.maximum(voxel_mask.sum(), 1.0)
    sum_axes = tuple(range(label_hard.ndim - 1))
    ratio_gen = jnp.sum(label_hard * voxel_mask[..., None], axis=sum_axes) / n_real
    ratio_true = jnp.sum(types_onehot, axis=sum_axes) / n_real
    g_loss_ratio = jnp.mean((ratio_gen[:-2] - ratio_true[:-2]) ** 2) * cfg.LAMBDA_RATIO
    g_loss_ratio_void = jnp.mean((ratio_gen[-2:] - ratio_true[-2:]) ** 2) * cfg.LAMBDA_RATIO_VOID

    # FAR term (quirk Q3: detached in the reference — log-only, no gradient)
    far_gen = generated_far(batch, label_hard)
    far_err = (far_gen - batch.far) ** 2
    g_mask = batch.graph_mask
    g_loss_far = jnp.sum(far_err * g_mask) / jnp.maximum(g_mask.sum(), 1.0)
    g_loss_far = jax.lax.stop_gradient(g_loss_far) * cfg.LAMBDA_FAR

    g_loss = g_loss_adv + g_loss_ratio + g_loss_label + g_loss_ratio_void + g_loss_far
    aux = {
        "g_loss_adv": g_loss_adv,
        "g_loss_label": g_loss_label,
        "g_loss_ratio": g_loss_ratio,
        "g_loss_ratio_void": g_loss_ratio_void,
        "g_loss_far": g_loss_far,
    }
    return g_loss, aux


def generated_far(batch, label_hard: jnp.ndarray) -> jnp.ndarray:
    """Per-graph FAR of generated labels (reference trainer.py:357-378).

    GFA = sum of (dim_y * dim_x) over generated non-void cells; FAR =
    GFA / site_area.  Grid layout: dense axis sums; packed layout: segment
    sum keyed on graph_id.
    """
    _, mask, is_grid = _batch_fields(batch)
    gen_type = jnp.argmax(label_hard, axis=-1)
    if is_grid:
        nonvoid = (gen_type != VOID).astype(label_hard.dtype) * batch.mask
        area = batch.dimension[..., 1] * batch.dimension[..., 2]
        if batch.gid is not None and batch.graphs_per_slot > 1:
            oh = jax.nn.one_hot(batch.gid, batch.graphs_per_slot, dtype=label_hard.dtype)
            gfa = jnp.einsum("bfyxk,bfyx->bk", oh, area * nonvoid)  # (B, K)
        else:
            gfa = jnp.sum(area * nonvoid, axis=(1, 2, 3))  # (B,)
    else:
        num_graphs = batch.graph_mask.shape[0]
        nonvoid = (gen_type != VOID).astype(label_hard.dtype) * batch.voxel_mask
        area = batch.voxel_dimension[:, 1] * batch.voxel_dimension[:, 2]
        gfa = jax.ops.segment_sum(
            area * nonvoid, batch.voxel_graph_id, num_segments=num_graphs + 1
        )[:num_graphs]
    return gfa / jnp.maximum(batch.site_area, 1e-6)
