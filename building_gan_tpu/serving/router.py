"""Multi-model routing over batched inference servers (ROADMAP #3).

The reference serves from a manual notebook loop with one checkpoint
(`building_gan/notebooks/test.ipynb`); a production deployment needs several
models live at once (A/B candidates, per-grid-size buckets) and zero-downtime
checkpoint rollover.  TPU shapes are static per compiled program, so the
natural unit of routing is "one (configuration, weights) pair = one
:class:`~building_gan_tpu.serving.server.InferenceServer` = one compiled
program"; this module composes those units:

- **Named routing** — ``add_model("prod", cfg, params)`` /
  ``infer(..., model="prod")``: each model keeps its own native micro-batcher
  and executor thread, so one slow or failing model never blocks another.
- **Size-bucket routing** — ``infer`` with no model name picks the smallest
  registered grid that FITS the request (the serving analog of
  ``Configuration.GRID_BUCKETS``): small buildings run the small compiled
  program and stop paying the (11,12,12) padding tax.
- **Checkpoint hot-swap** — ``swap_params(name, params)`` delegates to
  :meth:`InferenceServer.swap_params`: in-flight batches finish on the old
  weights, the next batch serves the new ones, no recompile and no dropped
  requests.
"""

from __future__ import annotations

import threading

import numpy as np

from ..config import Configuration
from .server import InferenceServer


class RoutingServer:
    """Route single-building requests across named :class:`InferenceServer`s."""

    def __init__(self):
        self._lock = threading.Lock()
        self._models: dict[str, InferenceServer] = {}
        self._default: str | None = None

    # ------------------------------------------------------------------
    def add_model(
        self,
        name: str,
        configuration: Configuration,
        params_g,
        default: bool = False,
        **server_kwargs,
    ) -> InferenceServer:
        """Register and start a server for ``name``; returns it.

        The first registered model becomes the default route; pass
        ``default=True`` to move the default later.
        """
        with self._lock:
            if name in self._models:
                raise ValueError(f"model {name!r} already registered")
            srv = InferenceServer(configuration, params_g, **server_kwargs).start()
            self._models[name] = srv
            if default or self._default is None:
                self._default = name
            return srv

    def remove_model(self, name: str) -> None:
        """Stop and unregister ``name`` (pending requests fail fast)."""
        with self._lock:
            srv = self._models.pop(name)
            if self._default == name:
                self._default = next(iter(self._models), None)
        srv.stop()

    def swap_params(self, name: str, params_g) -> int:
        """Hot-swap ``name``'s weights; returns the new version number."""
        return self._model(name).swap_params(params_g)

    def models(self) -> dict[str, dict]:
        """Name -> {grid_shape, params_version, batches_served} snapshot."""
        with self._lock:
            return {
                n: {
                    "grid_shape": tuple(s.configuration.GRID_SHAPE),
                    "params_version": s.params_version,
                    "batches_served": len(s.batch_sizes),
                    "default": n == self._default,
                }
                for n, s in self._models.items()
            }

    # ------------------------------------------------------------------
    def _model(self, name: str) -> InferenceServer:
        with self._lock:
            try:
                return self._models[name]
            except KeyError:
                raise KeyError(
                    f"no model {name!r}; registered: {sorted(self._models)}"
                ) from None

    def _route_by_size(self, voxel) -> InferenceServer:
        """Smallest registered grid that fits the building (static-shape
        bucket routing); falls back to the default for exotic fits."""
        loc = np.asarray(voxel.location)
        extent = loc.max(axis=0) + 1 if loc.shape[0] else np.zeros(3, int)
        with self._lock:
            fitting = [
                s
                for s in self._models.values()
                if (extent <= np.array(s.configuration.GRID_SHAPE)).all()
            ]
            if not fitting:
                if self._default is None:
                    raise RuntimeError("no models registered")
                return self._models[self._default]
        return min(fitting, key=lambda s: int(np.prod(s.configuration.GRID_SHAPE)))

    # ------------------------------------------------------------------
    def infer(
        self,
        local,
        voxel,
        model: str | None = None,
        seed: int = 0,
        timeout_s: float = 120.0,
    ) -> dict:
        """Blocking inference; routes to ``model`` or by grid-size bucket."""
        srv = self._model(model) if model is not None else self._route_by_size(voxel)
        return srv.infer(local, voxel, seed=seed, timeout_s=timeout_s)

    def stop(self) -> None:
        with self._lock:
            servers = list(self._models.values())
            self._models.clear()
            self._default = None
        for s in servers:
            s.stop()
