"""Profiling + seeding utilities.

- ``runtime_calculator``: the reference's wall-clock decorator
  (`building_gan/src/trainer.py:31-50`), re-exported here for parity.
- ``trace``: context manager around ``jax.profiler`` traces (the TPU-native
  replacement for print-timing; open the dump in XProf/TensorBoard).
- ``set_seed``: reference `config.py:137-157` equivalent — seeds the *host*
  RNGs (numpy, random).  Device randomness in this framework flows through
  explicit ``jax.random`` keys derived from ``Configuration.SEED`` (quirk Q9:
  the structure is reproduced, not torch's exact stream).
"""

from __future__ import annotations

import contextlib
import random
import time
from functools import wraps
from typing import Callable, Iterator

import numpy as np


def runtime_calculator(func: Callable) -> Callable:
    """Wall-clock decorator (reference trainer.py:31-50)."""

    @wraps(func)
    def wrapper(*args, **kwargs):
        start = time.time()
        result = func(*args, **kwargs)
        print(f"The function {func.__name__} took {time.time() - start} seconds to run.")
        return result

    return wrapper


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a jax.profiler trace for the enclosed block."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def set_seed(seed: int) -> None:
    """Seed host RNGs and report, mirroring reference config.py:137-157."""
    np.random.seed(seed)
    random.seed(seed)
    print("Seeds status:")
    print(f"  Seeds set for numpy        : {seed}")
    print(f"  Seeds set for random       : {seed}")
    print(f"  Device RNG: explicit jax.random keys derived from SEED={seed}")
