"""Device mesh construction for data-parallel training.

The reference is strictly single-process single-GPU (SURVEY.md §2.3); the
distributed layer here is greenfield: a 1-D ``data`` mesh whose axis shards
the packed-batch leading dimension, with gradient all-reduce riding ICI via
``lax.pmean`` inside the jitted step.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(n_data: Optional[int] = None, devices: Optional[Sequence] = None) -> Mesh:
    """1-D data-parallel mesh over ``n_data`` devices (default: all)."""
    if devices is None:
        devices = jax.devices()
    if n_data is None:
        n_data = len(devices)
    if n_data > len(devices):
        raise ValueError(f"requested {n_data} devices, have {len(devices)}")
    return Mesh(np.array(devices[:n_data]), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for a stacked PackedBatch: leading axis over the data mesh."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
