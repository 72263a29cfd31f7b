"""Persistent XLA compilation cache.

The flagship train step compiles in ~4 minutes through the tunneled TPU
backend (BENCH_r02 detail: compile_s 258); the compiled executable is fully
deterministic in (program, backend), so every invocation after the first is
pure waste without a persistent cache.  ``enable_compilation_cache()`` points
JAX at an on-disk cache (second bench/trainer/driver run hits it and compiles
in seconds) and is idempotent/safe to call from every entry point.

No reference counterpart (the torch reference has no compilation step);
this is TPU-framework infrastructure.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.expanduser("~/.cache/building_gan_tpu/jax_cache")


def enable_compilation_cache(cache_dir: str | None = None) -> str | None:
    """Enable JAX's persistent compilation cache; returns the cache dir.

    Order of precedence: explicit arg > $BGT_JAX_CACHE > default under
    ~/.cache.  Every compile is cached (min_compile_time 0) because even the
    small eval/viz programs pay multi-second tunnel round-trips.

    CPU backends are EXCLUDED (returns None) unless $BGT_JAX_CACHE_CPU=1:
    local CPU compiles are cheap, and XLA:CPU's AOT cache loader has been
    observed (this machine) loading entries whose recorded target features
    (`+prefer-no-scatter`, …) mismatch the host's, warning about possible
    SIGILL — not worth the risk for the driver's CPU-mesh validation runs.
    """
    import jax

    if os.environ.get("BGT_JAX_CACHE_CPU", "0") != "1":
        try:
            if jax.default_backend() == "cpu":
                return None
        except Exception:
            pass  # backend probe failed: fall through, cache is still useful

    path = cache_dir or os.environ.get("BGT_JAX_CACHE", _DEFAULT_DIR)
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return path
