"""Byte-entropy dropout — 4x cheaper mask generation than nn.Dropout.

Profiling the v5e train step showed dropout costing >50% of the whole
WGAN-GP step (379 -> 169 ms/step with rate 0): `nn.Dropout` draws a 32-bit
uniform per element (threefry), while a Bernoulli mask needs far less
entropy.  `FastDropout` draws ONE BYTE per element (`jax.random.bits`
uint8 — 4x fewer threefry rounds) and thresholds it.

The drop probability is quantized to 1/256 (e.g. rate 0.2 -> 51/256 =
0.19922); the inverse-keep scaling uses the EXACT quantized probability, so
E[output] == input exactly.  Byte entropy composes with the PRNG impl: an
early dropout-only rbg A/B measured no win, but switching the WHOLE step's
default impl to the TPU hardware generator (utils/prng.py) later measured
793k -> 881k nodes/s — under rbg the byte draw is 4x fewer generator words
just as it is under threefry.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from .rng import bulk_key


class FastDropout(nn.Module):
    """Drop-in replacement for `nn.Dropout(rate)(x, deterministic)`."""

    rate: float
    rng_collection: str = "dropout"

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool) -> jnp.ndarray:
        if deterministic or self.rate == 0.0:
            return x
        drop_levels = int(round(self.rate * 256.0))
        if drop_levels <= 0:
            return x
        if drop_levels >= 256:
            return jnp.zeros_like(x)
        keep_p = 1.0 - drop_levels / 256.0
        rng = self.make_rng(self.rng_collection)
        bits = jax.random.bits(bulk_key(rng), x.shape, dtype=jnp.uint8)
        keep = bits >= jnp.uint8(drop_levels)  # P(keep) = (256-d)/256 exactly
        scale = jnp.asarray(1.0 / keep_p, dtype=x.dtype)
        return jnp.where(keep, x * scale, jnp.zeros_like(x))
