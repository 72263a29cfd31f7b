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
# periodic crash-recovery checkpoint (config.CKPT_LATEST_INTERVAL) — the
# best-gated file above matches reference semantics (trainer.py:714-745);
# "latest" exists because a crash between best updates otherwise loses every
# epoch since the last best (the round-4 ref10k OOM lost 150: TRAINING.md)
LATEST_STATE_FILE = "states_latest.msgpack"
LATEST_META_FILE = "states_latest.meta.json"


def _write(log_dir: str, state, meta: dict, state_file: str, meta_file: str) -> None:
    os.makedirs(log_dir, exist_ok=True)
    state = jax.device_get(state)
    data = serialization.to_bytes(state)
    tmp = os.path.join(log_dir, state_file + ".tmp")
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, os.path.join(log_dir, state_file))

    tmp = os.path.join(log_dir, meta_file + ".tmp")
    with open(tmp, "w") as f:
        json.dump(meta, f, indent=2)
    os.replace(tmp, os.path.join(log_dir, meta_file))


def save_states(log_dir: str, state, meta: dict) -> None:
    """Write the best-gated checkpoint (state pytree + JSON meta) atomically."""
    _write(log_dir, state, meta, STATE_FILE, META_FILE)


def save_latest(log_dir: str, state, meta: dict) -> None:
    """Write the periodic crash-recovery checkpoint atomically."""
    _write(log_dir, state, meta, LATEST_STATE_FILE, LATEST_META_FILE)


def _migrate_opt_g(raw: dict, template) -> dict:
    """Map a round-1 plain-Adam ``opt_g`` into the inject_hyperparams layout.

    Round 1 built ``tx_g = optax.adam(...)`` (state serialized as a 2-tuple
    {'0': ScaleByAdamState, '1': EmptyState}); round 2+ wraps it in
    ``optax.inject_hyperparams`` whose state adds count/hyperparams around the
    same inner tuple.  Old checkpoints restore with the template's initial
    hyperparams — the trainer re-sets the cosine G LR at the next epoch
    boundary (`set_g_lr`), so the migrated value is correct within one epoch.
    """
    og = raw.get("opt_g")
    if not (isinstance(og, dict) and set(og.keys()) == {"0", "1"}):
        return raw  # already the new layout (or something else entirely)
    tmpl_raw = serialization.to_state_dict(jax.device_get(template))
    new_og = dict(tmpl_raw["opt_g"])  # count/hyperparams[/hyperparams_states]
    new_og["inner_state"] = og
    # old ScaleByAdamState.count drives bias correction; keep it as the outer
    # count too (inject_hyperparams counts the same updates)
    try:
        new_og["count"] = og["0"]["count"]
    except (KeyError, TypeError):
        pass
    out = dict(raw)
    out["opt_g"] = new_og
    return out


def load_states(
    log_dir: str,
    state_template,
    state_file: str = STATE_FILE,
    meta_file: str = META_FILE,
) -> Optional[Tuple[object, dict]]:
    """Restore (state, meta) from ``log_dir`` or None if no checkpoint.

    Transparently migrates round-1 checkpoints whose ``opt_g`` predates the
    ``inject_hyperparams`` wrapper (see :func:`_migrate_opt_g`).
    """
    path = os.path.join(log_dir, state_file)
    meta_path = os.path.join(log_dir, meta_file)
    if not os.path.exists(path):
        return None
    with open(path, "rb") as f:
        data = f.read()
    try:
        state = serialization.from_bytes(state_template, data)
    except (ValueError, KeyError):
        raw = serialization.msgpack_restore(data)
        raw = _migrate_opt_g(raw, state_template)
        state = serialization.from_state_dict(state_template, raw)
    meta = {}
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    return state, meta


def load_latest(log_dir: str, state_template) -> Optional[Tuple[object, dict]]:
    """Restore the periodic crash-recovery checkpoint, or None."""
    return load_states(log_dir, state_template, LATEST_STATE_FILE, LATEST_META_FILE)


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
