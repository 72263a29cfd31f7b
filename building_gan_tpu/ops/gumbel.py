"""Gumbel-softmax with straight-through hard one-hot sampling.

TPU-native equivalent of ``torch.nn.functional.gumbel_softmax`` plus the
scatter-based straight-through trick the reference generator head uses
(`building_gan/src/models.py:150-154`):

    label_soft = gumbel_softmax(logits, tau=1.0)
    label_hard = one_hot(argmax(label_soft)) - sg(label_soft) + label_soft

so the forward pass emits a hard one-hot while gradients flow through the soft
sample.  Noise comes from an explicit JAX PRNG key (reference draws from the
global torch RNG — quirk Q9).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .rng import bulk_key


def gumbel_softmax_st(
    logits: jnp.ndarray, key: jax.Array, tau: float = 1.0
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Returns ``(label_hard, label_soft)``; hard carries the ST gradient."""
    g = jax.random.gumbel(bulk_key(key), logits.shape, dtype=logits.dtype)
    label_soft = jax.nn.softmax((logits + g) / tau, axis=-1)
    idx = jnp.argmax(label_soft, axis=-1)
    hard = jax.nn.one_hot(idx, logits.shape[-1], dtype=logits.dtype)
    label_hard = hard - jax.lax.stop_gradient(label_soft) + label_soft
    return label_hard, label_soft
