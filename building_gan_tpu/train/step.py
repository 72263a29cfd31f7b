"""The fully-jitted adversarial train step.

One XLA program contains what the reference runs as ~22 separate
CUDA-launch-heavy python iterations per batch (`building_gan/src/trainer.py:
459-502`): the N_CRITIC=5 discriminator loop (each with real/fake/interpolated
critic passes and the WGAN-GP double-backward), the generator update, and the
metric computation.  No host sync occurs inside an epoch except to log.

Structure:
    train_step(state, batch, key) -> (state, metrics_dict)
      - lax.fori_loop over N_CRITIC D updates (fresh z + Gumbel noise per
        iteration, G applied under stop_gradient — reference trainer.py:467-481)
      - one G update through the ST-Gumbel head (trainer.py:484-495)
      - in-graph confusion-matrix metrics (trainer.py:497-502)

``axis_name`` enables data parallelism: gradients are ``lax.pmean``-ed and
metrics ``lax.psum``-ed across the mesh axis before the (replicated)
optimizer update — the ICI all-reduce the reference has no counterpart for
(SURVEY.md §2.3).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import optax

from ..config import Configuration, NUM_CLASSES
from . import losses as L
from . import metrics as M
from ..ops.rng import normal_box_muller
from .losses import _batch_fields
from .state import TrainState


def make_train_step(
    cfg: Configuration,
    gen,
    disc,
    tx_g: optax.GradientTransformation,
    tx_d: optax.GradientTransformation,
    axis_name: Optional[str] = None,
) -> Callable:
    """Build the jittable train step for a single (per-device) packed batch."""

    def wmean(tree, w):
        """Cross-device mean weighted by per-device real NODE count.

        Per-device losses are masked node-means; weighting each device's
        loss/gradient by its real-cell count ``w`` makes the cross-device
        aggregate EXACTLY the merged-batch node mean the reference computes on
        one GPU (sum_d n_d*mean_d / sum_d n_d == merged mean), including
        unevenly-filled epoch-tail packs (VERDICT r2 #6).  All-null fill packs
        get w=0 and contribute nothing (VERDICT r1 weak #7).  The ratio/FAR
        terms are per-device statistics either way; node weights are the
        closest analog of the reference's merged-batch computation for them.
        """
        if axis_name is None:
            return tree
        sw = jnp.maximum(jax.lax.psum(w, axis_name), 1.0)
        return jax.tree.map(lambda x: jax.lax.psum(x * w, axis_name) / sw, tree)

    # Fused custom-VJP Pallas hourglass path (docs/PERF.md §4 lever 2): the
    # generator and the real/fake critic passes run one-kernel-per-layer;
    # the GP critic pass stays XLA (the penalty is differentiated twice and
    # custom_vjp is first-order).  RNG streams for hourglass dropout differ
    # from the flax path (in-kernel TPU PRNG vs threefry) — same
    # Bernoulli(rate) semantics, so this is a perf mode, not a parity mode.
    use_fused = bool(getattr(cfg, "USE_PALLAS_TRAIN", False))
    if use_fused:
        from ..models import fast_train as FT

    def generator_forward(params_g, batch, key, deterministic=False):
        kz, kgum, kdrop = jax.random.split(key, 3)
        _, mask, _ = _batch_fields(batch)
        # z directly in the compute dtype: the model casts z.astype(dtype) on
        # entry anyway, so this is bit-identical — but the cast happens inside
        # the Box-Muller fusion instead of inside the 42 MB relayout copy the
        # generator's GEMM layout forces on z (scripts/hlo_copies.py), halving
        # that copy's read bytes and the RNG fusion's writes.
        z = normal_box_muller(kz, mask.shape + (cfg.Z_DIM,), dtype=cfg.compute_dtype)
        if use_fused:
            return FT.generator_apply_fused(
                params_g, cfg, batch, z, kgum, kdrop,
                deterministic=deterministic, tile=cfg.PALLAS_TRAIN_TILE,
            )
        return gen.apply(
            {"params": params_g},
            batch,
            z,
            deterministic=deterministic,
            rngs={"gumbel": kgum, "dropout": kdrop},
        )

    def d_apply(params_d, batch, label, key, deterministic=False):
        """XLA critic — arbitrarily differentiable (used for the GP term)."""
        return disc.apply(
            {"params": params_d},
            batch,
            label,
            deterministic=deterministic,
            rngs={"dropout": key},
        )

    # GP-branch critic: same params, optionally f32 activations
    # (config.GP_DTYPE) — the doubly-differentiated penalty needs an accurate
    # input-gradient norm; see config.py GP_DTYPE and TRAINING.md.
    disc_gp = (
        disc.clone(dtype=jnp.float32)
        if getattr(cfg, "GP_DTYPE", "compute") == "float32"
        else disc
    )

    def d_apply_gp(params_d, batch, label, key, deterministic=False):
        return disc_gp.apply(
            {"params": params_d},
            batch,
            label,
            deterministic=deterministic,
            rngs={"dropout": key},
        )

    def d_apply_fast(params_d, batch, label, key, deterministic=False):
        """Critic for real/fake passes: fused kernel when enabled."""
        if use_fused:
            return FT.discriminator_apply_fused(
                params_d, cfg, batch, label, key,
                deterministic=deterministic, tile=cfg.PALLAS_TRAIN_TILE,
            )
        return d_apply(params_d, batch, label, key, deterministic)

    def critic_update(params_g, params_d, opt_d, batch, types_onehot, key, w):
        kgen, kgp, kd, kd2 = jax.random.split(key, 4)
        _, voxel_mask, _ = _batch_fields(batch)
        # G forward without gradient (reference trainer.py:469-473)
        _, label_hard, label_soft = generator_forward(params_g, batch, kgen)
        label_hard = jax.lax.stop_gradient(label_hard)
        label_soft = jax.lax.stop_gradient(label_soft)

        def d_loss_fn(pd):
            return L.discriminator_loss(
                lambda lbl: d_apply_fast(pd, batch, lbl, kd),
                types_onehot,
                label_hard,
                label_soft,
                voxel_mask,
                kgp,
                cfg,
                d_apply_gp=lambda lbl: d_apply_gp(pd, batch, lbl, kd),
            )

        d_loss, grads = jax.value_and_grad(d_loss_fn)(params_d)
        grads = wmean(grads, w)
        updates, opt_d = tx_d.update(grads, opt_d, params_d)
        params_d = optax.apply_updates(params_d, updates)
        return params_d, opt_d, wmean(d_loss, w)

    def train_step(state: TrainState, batch, key: jax.Array):
        types, mask, is_grid = _batch_fields(batch)
        types_onehot = jax.nn.one_hot(types, NUM_CLASSES, dtype=jnp.float32)
        types_onehot = types_onehot * mask[..., None]
        # real-cell count: node-weighted aggregation (0.0 for null fill packs)
        w = jnp.sum(mask).astype(jnp.float32)

        # --- N_CRITIC discriminator updates (reference trainer.py:467-481) ---
        def body(i, carry):
            params_d, opt_d, d_loss_sum = carry
            k = jax.random.fold_in(key, i)
            params_d, opt_d, d_loss = critic_update(
                state.params_g, params_d, opt_d, batch, types_onehot, k, w
            )
            return params_d, opt_d, d_loss_sum + d_loss

        params_d, opt_d, d_loss_sum = jax.lax.fori_loop(
            0,
            cfg.N_CRITIC,
            body,
            (state.params_d, state.opt_d, jnp.zeros(())),
            # unrolled: no while-carried opt/param copies (config.UNROLL_CRITIC)
            unroll=max(cfg.N_CRITIC, 1) if getattr(cfg, "UNROLL_CRITIC", False) else 1,
        )
        d_loss_mean = d_loss_sum / cfg.N_CRITIC

        # --- generator update (reference trainer.py:484-495) ---
        kg = jax.random.fold_in(key, cfg.N_CRITIC)
        kgd = jax.random.fold_in(key, cfg.N_CRITIC + 1)

        def g_loss_fn(pg):
            logits, label_hard, _ = generator_forward(pg, batch, kg)
            g_loss, aux = L.generator_loss(
                lambda lbl: d_apply_fast(params_d, batch, lbl, kgd),
                batch,
                logits,
                label_hard,
                cfg,
            )
            return g_loss, (aux, label_hard)

        (g_loss, (g_aux, label_hard)), grads = jax.value_and_grad(g_loss_fn, has_aux=True)(
            state.params_g
        )
        grads = wmean(grads, w)
        updates, opt_g = tx_g.update(grads, state.opt_g, state.params_g)
        params_g = optax.apply_updates(state.params_g, updates)

        # --- in-graph metrics (reference trainer.py:497-502) ---
        y_pred = jnp.argmax(label_hard, axis=-1)
        graph_id = None if is_grid else batch.voxel_graph_id
        gid = batch.gid if is_grid else None
        kps = batch.graphs_per_slot if is_grid else 1
        m = M.compute_metrics(
            types, y_pred, mask, graph_id, batch.graph_mask, gid=gid, num_graphs_per_slot=kps
        )
        if axis_name is not None:
            # null-fill packs contribute zero CM rows; exclude them from pmin
            cm = jax.lax.psum(m["confusion_matrix"], axis_name)
            scores = M._scores_from_cm(cm)
            f1_min_dev = jnp.where(w > 0, m["f1_min"], jnp.inf)
            f1_min = jax.lax.pmin(f1_min_dev, axis_name)
            f1_min = jnp.where(jnp.isfinite(f1_min), f1_min, 0.0)
            m = {
                "f1": scores["f1"],
                "f1_min": f1_min,
                "precision": scores["precision"],
                "recall": scores["recall"],
                "accuracy": scores["accuracy"],
                # per-graph F1 distribution survives sharding: counts psum
                # exactly (reference logs the per-graph list, trainer.py:418-441)
                "per_graph_f1_hist": jax.lax.psum(m["per_graph_f1_hist"], axis_name),
                # epoch CM sums on the host -> per-class recall TB tags
                "confusion_matrix": cm,
            }
        else:
            m = {
                k: m[k]
                for k in (
                    "f1", "f1_min", "precision", "recall", "accuracy",
                    "per_graph_f1_hist", "confusion_matrix",
                )
            }

        metrics = {
            "g_loss": wmean(g_loss, w),
            "d_loss": d_loss_mean,
            **{k: wmean(v, w) for k, v in g_aux.items()},
            **m,
        }
        new_state = TrainState(
            step=state.step + 1,
            params_g=params_g,
            params_d=params_d,
            opt_g=opt_g,
            opt_d=opt_d,
        )
        return new_state, metrics

    return train_step


def make_eval_step(cfg: Configuration, gen, disc, axis_name: Optional[str] = None) -> Callable:
    """Jittable validation step: G forward + G loss + metrics, no updates
    (reference `_validate_each_epoch`, trainer.py:522-577).

    With ``axis_name`` the step runs sharded over a device mesh: confusion
    matrices are psum-ed (exact global scores) and losses are weighted-mean-ed
    so null epoch-fill packs contribute nothing.
    """

    def wmean(tree, w):
        if axis_name is None:
            return tree
        sw = jnp.maximum(jax.lax.psum(w, axis_name), 1.0)
        return jax.tree.map(lambda x: jax.lax.psum(x * w, axis_name) / sw, tree)

    def eval_step(state: TrainState, batch, key: jax.Array):
        kz, kgum = jax.random.split(key)
        types, mask, is_grid = _batch_fields(batch)
        # compute-dtype z: bit-identical (model casts on entry), cheaper draw
        z = normal_box_muller(kz, mask.shape + (cfg.Z_DIM,), dtype=cfg.compute_dtype)
        logits, label_hard, _ = gen.apply(
            {"params": state.params_g},
            batch,
            z,
            deterministic=True,
            rngs={"gumbel": kgum},
        )
        g_loss, g_aux = L.generator_loss(
            lambda lbl: disc.apply({"params": state.params_d}, batch, lbl, deterministic=True),
            batch,
            logits,
            label_hard,
            cfg,
        )
        y_pred = jnp.argmax(label_hard, axis=-1)
        graph_id = None if is_grid else batch.voxel_graph_id
        gid = batch.gid if is_grid else None
        kps = batch.graphs_per_slot if is_grid else 1
        m = M.compute_metrics(
            types, y_pred, mask, graph_id, batch.graph_mask, gid=gid, num_graphs_per_slot=kps
        )
        if axis_name is not None:
            w = jnp.sum(mask).astype(jnp.float32)  # node-weighted (VERDICT r2 #6)
            cm = jax.lax.psum(m["confusion_matrix"], axis_name)
            scores = M._scores_from_cm(cm)
            f1_min_dev = jnp.where(w > 0, m["f1_min"], jnp.inf)
            f1_min = jax.lax.pmin(f1_min_dev, axis_name)
            f1_min = jnp.where(jnp.isfinite(f1_min), f1_min, 0.0)
            return {
                "g_loss": wmean(g_loss, w),
                **{k: wmean(v, w) for k, v in g_aux.items()},
                "f1": scores["f1"],
                "f1_min": f1_min,
                "precision": scores["precision"],
                "recall": scores["recall"],
                "accuracy": scores["accuracy"],
                "per_graph_f1_hist": jax.lax.psum(m["per_graph_f1_hist"], axis_name),
                "confusion_matrix": cm,
            }
        return {
            "g_loss": g_loss,
            **g_aux,
            **{k: m[k] for k in ("f1", "f1_min", "precision", "recall", "accuracy")},
            "per_graph_f1": m["per_graph_f1"],
            "per_graph_f1_hist": m["per_graph_f1_hist"],
            "confusion_matrix": m["confusion_matrix"],
        }

    return eval_step
