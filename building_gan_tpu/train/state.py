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


def make_optimizers(cfg: Configuration, total_g_updates: int):
    """Adam pair + cosine-annealed G schedule (reference train.py:36-38).

    The reference steps ``CosineAnnealingLR(T_max=EPOCHS)`` once per epoch;
    here the equivalent continuous schedule runs over G-update steps
    (``total_g_updates`` = EPOCHS * steps_per_epoch), reaching 0 at the end —
    same trajectory, no host-side scheduler object.
    """
    g_schedule = optax.cosine_decay_schedule(
        init_value=cfg.LEARNING_RATE_GENERATOR,
        decay_steps=max(total_g_updates, 1),
    )
    tx_g = optax.adam(learning_rate=g_schedule, b1=cfg.BETAS[0], b2=cfg.BETAS[1])
    tx_d = optax.adam(
        learning_rate=cfg.LEARNING_RATE_DISCRIMINATOR, b1=cfg.BETAS[0], b2=cfg.BETAS[1]
    )
    return tx_g, tx_d


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
