"""Single-file best-gated checkpoint with the reference ``states.pt`` schema.

Mirrors the reference checkpoint semantics exactly (SURVEY.md §5):

- one file (``states.msgpack``) holding epoch bounds, the best/current F1
  family, and all model/optimizer state (reference `trainer.py:715-736`);
- saved only when the weighted min-F1 criterion improves
  (`trainer.py:675-678, 695`);
- on non-improving epochs only ``epoch_start`` is patched into the existing
  file, so resume restores *best* weights at the *current* epoch (quirk Q11,
  `trainer.py:741-745`);
- auto-resume on construction when the file exists (`trainer.py:628-636`).

Serialization is flax msgpack over the :class:`TrainState` pytree — a
framework-neutral, torch-free ``states.pt`` equivalent.
"""

from __future__ import annotations

import json
import os
from typing import Optional, Tuple

import jax
from flax import serialization

STATE_FILE = "states.msgpack"
META_FILE = "states.meta.json"


def save_states(log_dir: str, state, meta: dict) -> None:
    """Write checkpoint (state pytree + JSON metadata) atomically."""
    os.makedirs(log_dir, exist_ok=True)
    state = jax.device_get(state)
    data = serialization.to_bytes(state)
    tmp = os.path.join(log_dir, STATE_FILE + ".tmp")
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, os.path.join(log_dir, STATE_FILE))

    tmp = os.path.join(log_dir, META_FILE + ".tmp")
    with open(tmp, "w") as f:
        json.dump(meta, f, indent=2)
    os.replace(tmp, os.path.join(log_dir, META_FILE))


def load_states(log_dir: str, state_template) -> Optional[Tuple[object, dict]]:
    """Restore (state, meta) from ``log_dir`` or None if no checkpoint."""
    path = os.path.join(log_dir, STATE_FILE)
    meta_path = os.path.join(log_dir, META_FILE)
    if not os.path.exists(path):
        return None
    with open(path, "rb") as f:
        state = serialization.from_bytes(state_template, f.read())
    meta = {}
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    return state, meta


def exists(log_dir: str) -> bool:
    return os.path.exists(os.path.join(log_dir, STATE_FILE))


def patch_epoch_start(log_dir: str, epoch: int) -> None:
    """Advance only the resume cursor, keeping best weights (quirk Q11)."""
    meta_path = os.path.join(log_dir, META_FILE)
    meta = {}
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    meta["epoch_start"] = epoch
    tmp = meta_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(meta, f, indent=2)
    os.replace(tmp, meta_path)
