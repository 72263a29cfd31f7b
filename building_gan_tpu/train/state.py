"""Train state pytree: G/D params + optimizer states + step counter.

The TPU equivalent of the reference's ad-hoc ``states`` dict
(`building_gan/src/trainer.py:608-626`): a single pytree that one jitted step
threads through, orbax-serializable for checkpoint/resume.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..config import Configuration


@struct.dataclass
class TrainState:
    step: jnp.ndarray  # global G-update counter
    params_g: Any
    params_d: Any
    opt_g: Any
    opt_d: Any


def make_optimizers(cfg: Configuration, total_g_updates: int = 0):
    """Adam pair + per-epoch cosine G schedule (reference train.py:36-38).

    The reference steps ``CosineAnnealingLR(T_max=EPOCHS)`` once per EPOCH.
    The G learning rate is therefore injected as an optimizer-state
    hyperparameter (``opt_g.hyperparams['learning_rate']``) and set on epoch
    boundaries by the trainer via :func:`cosine_lr` / :func:`set_g_lr` —
    EXACTLY the reference trajectory, independent of how many packed steps a
    shuffled/bucketed epoch happens to produce.  ``total_g_updates`` is kept
    for API compatibility (step-continuous schedules would use it); callers
    that never touch the hyperparameter train at the constant initial LR.
    """
    del total_g_updates
    tx_g = optax.inject_hyperparams(optax.adam)(
        learning_rate=cfg.LEARNING_RATE_GENERATOR, b1=cfg.BETAS[0], b2=cfg.BETAS[1]
    )
    tx_d = optax.adam(
        learning_rate=cfg.LEARNING_RATE_DISCRIMINATOR, b1=cfg.BETAS[0], b2=cfg.BETAS[1]
    )
    return tx_g, tx_d


def cosine_lr(cfg: Configuration, epoch: int) -> float:
    """CosineAnnealingLR(T_max=EPOCHS) value entering ``epoch`` (1-based),
    matching torch semantics: epoch 1 runs at the initial LR, the last epoch
    approaches 0 (reference train.py:36-38, eta_min=0)."""
    import math

    t = min(max(epoch - 1, 0), cfg.EPOCHS)
    return cfg.LEARNING_RATE_GENERATOR * 0.5 * (1.0 + math.cos(math.pi * t / cfg.EPOCHS))


def set_g_lr(state: TrainState, lr: float) -> TrainState:
    """Return ``state`` with the injected G learning rate set to ``lr``."""
    opt_g = state.opt_g
    hp = dict(opt_g.hyperparams)
    hp["learning_rate"] = jnp.asarray(lr, dtype=jnp.asarray(hp["learning_rate"]).dtype)
    return state.replace(opt_g=opt_g._replace(hyperparams=hp))


def create_train_state(
    cfg: Configuration,
    gen,
    disc,
    batch,
    key: jax.Array,
    total_g_updates: int,
):
    """Initialize params for both networks and their optimizer states."""
    from ..config import NUM_CLASSES
    from .losses import _batch_fields

    types, mask, _ = _batch_fields(batch)
    kg, kd, kz = jax.random.split(key, 3)
    z = jnp.zeros(mask.shape + (cfg.Z_DIM,), dtype=jnp.float32)
    label = jax.nn.one_hot(types, NUM_CLASSES)

    # jit the inits: eager flax init dispatches every op individually, which
    # is pathological over a remote-tunneled TPU backend (~0.2s/op).
    g_init = jax.jit(lambda rngs, b, zz: gen.init(rngs, b, zz, deterministic=True))
    d_init = jax.jit(lambda rngs, b, lb: disc.init(rngs, b, lb, deterministic=True))
    params_g = g_init({"params": kg, "gumbel": kz, "dropout": kz}, batch, z)["params"]
    params_d = d_init({"params": kd, "dropout": kz}, batch, label)["params"]

    tx_g, tx_d = make_optimizers(cfg, total_g_updates)
    return (
        TrainState(
            step=jnp.zeros((), jnp.int32),
            params_g=params_g,
            params_d=params_d,
            opt_g=tx_g.init(params_g),
            opt_d=tx_d.init(params_d),
        ),
        tx_g,
        tx_d,
    )
