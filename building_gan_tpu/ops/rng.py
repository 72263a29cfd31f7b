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

# Hardware bulk bit generation (PRNG_IMPL="rbg_full", utils/prng.py).
# Toggled at trace time; OFF by default so tests/parity keep pure threefry.
_HW_BULK = False


def set_hw_bulk(enabled: bool) -> None:
    """Enable/disable hardware (RngBitGenerator) bulk draws via `bulk_key`.

    Raw trace-time switch: the flag is NOT part of the jit cache key, so
    flipping it does not invalidate already-compiled executables.  Use
    ``utils.prng.apply_prng_impl`` (which clears jax's compilation caches on
    a mode change) unless you know no affected function has been traced.
    """
    global _HW_BULK
    _HW_BULK = bool(enabled)


def hw_bulk_enabled() -> bool:
    return _HW_BULK


def bulk_key(key: jax.Array) -> jax.Array:
    """The key a BULK leaf draw (no further split/fold_in) should use.

    Identity by default.  Under ``PRNG_IMPL="rbg_full"`` it derives a
    FULL-ENTROPY 128-bit ``rbg`` key from the threefry key — 4 independent
    threefry output words wrapped with ``jax.random.wrap_key_data`` — so the
    bulk bits come from the TPU hardware generator while key DERIVATION stays
    threefry end-to-end.  This is deliberately different from jax's seeded
    ``rbg`` keys, which duplicate the threefry halfkey ([a, b, a, b]) and
    derive both halves identically under split/fold_in, so the hardware
    generator only ever sees structured, effectively-64-bit keys — the defect
    implicated in the 700-epoch WGAN-GP collapse (docs/PERF.md §11).  Here no
    rbg key is ever split or folded: every hardware invocation gets an
    unstructured 128-bit key, and the threefry cost is 4 words per draw SITE
    instead of per element.
    """
    if not _HW_BULK:
        return key
    data = jax.random.bits(key, (4,), jnp.uint32)
    return jax.random.wrap_key_data(data, impl="rbg")


def normal_box_muller(key: jax.Array, shape, dtype=jnp.float32) -> jnp.ndarray:
    """N(0,1) sample of ``shape`` via Box-Muller (exact, erf_inv-free).

    Uses BOTH Box-Muller outputs (r·cos and r·sin from one uniform pair), so
    each output element costs one uniform draw and half a log/sqrt — ~2x
    fewer threefry bits and transcendentals than the one-branch form.  The
    z draw is ~5% of the bench train step (docs/PERF.md §2), so this is a
    direct step-time lever, not a micro-optimisation.
    """
    shape = tuple(shape)
    k1, k2 = jax.random.split(key)
    k1, k2 = bulk_key(k1), bulk_key(k2)
    if shape and shape[-1] % 2 == 0:
        # Even minor dim (the z draw: C = Z_DIM = 128): draw the pair axis
        # in place, (..., C/2, 2) -> reshape (..., C).  The flat
        # concat-then-reshape form below leaves z transposed relative to its
        # (B, R, C) consumers and XLA inserts a 42.6 MB layout-flip copy per
        # draw (scripts/hlo_copies.py); the shaped form is copy-free.
        half_shape = shape[:-1] + (shape[-1] // 2,)
        # u1 in (0, 1]: 1 - uniform[0,1) keeps log() finite
        u1 = 1.0 - jax.random.uniform(k1, half_shape, dtype=jnp.float32)
        u2 = jax.random.uniform(k2, half_shape, dtype=jnp.float32)
        r = jnp.sqrt(-2.0 * jnp.log(u1))
        theta = (2.0 * jnp.pi) * u2
        z = jnp.stack([r * jnp.cos(theta), r * jnp.sin(theta)], axis=-1)
        return z.reshape(shape).astype(dtype)
    n = 1
    for s in shape:
        n *= s
    half = (n + 1) // 2
    u1 = 1.0 - jax.random.uniform(k1, (half,), dtype=jnp.float32)
    u2 = jax.random.uniform(k2, (half,), dtype=jnp.float32)
    r = jnp.sqrt(-2.0 * jnp.log(u1))
    theta = (2.0 * jnp.pi) * u2
    z = jnp.concatenate([r * jnp.cos(theta), r * jnp.sin(theta)])[:n]
    return z.reshape(shape).astype(dtype)
