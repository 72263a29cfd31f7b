"""Fast on-device normal sampling.

``jax.random.normal`` lowers N(0,1) through ``erf_inv``; measured on v5e the
f32 path runs at ~0.2 Gelem/s (105 ms for one 26M-element z tensor — slower
than entire network passes), while uniforms generate at ~40 Gelem/s.
``normal_box_muller`` draws two uniforms and applies the Box-Muller
transform instead: exact N(0,1) in f32, ~40x faster, no erf_inv.

Used for the generator's z noise (train step, eval, serving, viz); Gumbel
noise is unaffected (jax's gumbel uses log(-log u), which is already fast).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def normal_box_muller(key: jax.Array, shape, dtype=jnp.float32) -> jnp.ndarray:
    """N(0,1) sample of ``shape`` via Box-Muller (exact, erf_inv-free)."""
    k1, k2 = jax.random.split(key)
    # u1 in (0, 1]: 1 - uniform[0,1) keeps log() finite
    u1 = 1.0 - jax.random.uniform(k1, shape, dtype=jnp.float32)
    u2 = jax.random.uniform(k2, shape, dtype=jnp.float32)
    r = jnp.sqrt(-2.0 * jnp.log(u1))
    z = r * jnp.cos((2.0 * jnp.pi) * u2)
    return z.astype(dtype)
