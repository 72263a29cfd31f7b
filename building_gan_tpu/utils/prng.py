"""PRNG implementation selection: TPU hardware generator vs threefry.

The default JAX PRNG (threefry2x32) computes random bits with XLA integer
ops; at reference scale the train step draws ~150M random values (z noise,
Gumbel noise, GP epsilon, dropout bytes) per step and the threefry
bit-generation fusions are ~4.8% of the step, with the uniform conversion
glue on top (docs/PERF.md §6).  The ``rbg`` implementation routes draws
through XLA's RngBitGenerator — the TPU's hardware generator — while still
deriving keys (seed/split/fold_in) with threefry, so key semantics (explicit,
reproducible key discipline; SURVEY.md §2.2) are unchanged.  Measured on
v5e-1: 793k -> 881k nodes/s (178 -> 160 ms/step, docs/PERF.md §9).

Semantics note (quirk Q9 already applies): the VALUES drawn under rbg differ
from threefry and are not guaranteed stable across XLA versions or shardings;
the reference's own RNG stream is torch-global and equally untranslatable.
Structure (seeded splits, fresh per-step noise) is what parity requires, and
that is impl-independent.  Tests and strict cross-program parity comparisons
run on CPU where the default stays threefry.
"""

from __future__ import annotations


def apply_prng_impl(impl: str = "auto", inference: bool = False) -> str:
    """Set ``jax_default_prng_impl``; resolves ``"auto"`` by context.

    auto -> on TPU, ``rbg_full`` for training and ``rbg`` for inference
    surfaces; ``threefry2x32`` everywhere else (CPU tests/parity keep
    bitwise-stable streams).  Returns the impl applied.  Call before
    creating keys (keys remember their impl; existing keys keep working
    either way).  Safe to call after tracing too: flipping the ``rbg_full``
    hw-bulk mode clears jax's compilation caches, because that flag is
    trace-time module state rather than part of the jit cache key — without
    the clear, steps compiled under the previous mode would silently keep
    its RNG routing.

    History of this default (TRAINING.md "Numerics ablation" +
    "rbg_full multi-seed validation"): plain ``rbg`` trains 11% faster but
    collapsed 2 of 4 WGAN-GP arms — jax's seeded rbg keys are [a, b, a, b]
    (the threefry halfkey duplicated) and split/fold_in derive both halves
    identically, so the TPU RngBitGenerator only ever sees structured,
    effectively-64-bit keys.  Training therefore ran threefry through round
    3.  ``rbg_full`` (threefry key derivation + full-entropy 128-bit bulk
    keys, docs/PERF.md §12) keeps 99.6% of the hardware-RNG win and passed
    the same 700-epoch assay on 3/3 seeds (777/1234/2024: test F1 0.9787/
    0.9833/0.9830, every arm above the best threefry arm) — it became the
    training default in round 4.  Inference draws carry no feedback loop,
    so plain ``rbg`` (marginally faster) stays the auto choice there.
    """
    import warnings

    import jax

    from ..ops.rng import hw_bulk_enabled, set_hw_bulk

    if impl in ("", "auto", None):
        impl = "threefry2x32"
        try:
            if jax.default_backend() == "tpu":
                impl = "rbg" if inference else "rbg_full"
        except Exception:
            pass  # backend probe can raise on driver machines (verify skill)
    if impl == "rbg_full":
        # Full-entropy hardware bulk generation (docs/PERF.md §12): keys and
        # all split/fold_in derivation stay threefry; each BULK leaf draw
        # (z uniforms, Gumbel, GP epsilon, dropout bytes) wraps 4 independent
        # threefry words into an unstructured 128-bit rbg key and generates
        # its bits on the TPU hardware generator (ops/rng.py::bulk_key).
        # This keeps the rbg throughput win while avoiding the structured
        # [a,b,a,b] keys implicated in the WGAN-GP collapse (§11).
        try:
            if jax.default_backend() != "tpu":
                warnings.warn(
                    "PRNG_IMPL='rbg_full' on a non-TPU backend: RngBitGenerator "
                    "is a software fallback there — slower than threefry and "
                    "backend-dependent in its values.  Intended for TPU only.",
                    stacklevel=2,
                )
        except Exception:
            pass  # backend probe can raise on driver machines (verify skill)
        if not hw_bulk_enabled():
            # The hw-bulk flag is trace-time module state, NOT part of the jit
            # cache key: executables compiled before the flip would silently
            # keep the old RNG routing.  Drop them so every live jitted
            # function re-traces under the new mode.
            jax.clear_caches()
        set_hw_bulk(True)
        jax.config.update("jax_default_prng_impl", "threefry2x32")
        return impl
    if hw_bulk_enabled():
        jax.clear_caches()  # see rbg_full branch: flag is not a jit cache key
    set_hw_bulk(False)
    jax.config.update("jax_default_prng_impl", impl)
    return impl
