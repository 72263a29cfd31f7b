"""Batched inference server: dynamic micro-batching over the jitted generator.

Production serving surface (ROADMAP #3; the reference has only a manual
notebook loop, `building_gan/notebooks/test.ipynb`):

- requests (one building each: LocalGraph + VoxelGraph + seed) arrive from
  any thread via :meth:`InferenceServer.infer`;
- the NATIVE dynamic batcher (`native/batcher.cc`, ctypes) forms micro-
  batches under a size-or-deadline policy;
- one executor thread packs each micro-batch into a fixed-slot
  :class:`GridBatch` and runs ONE jitted generator forward (static shapes —
  a single compiled program regardless of batch composition);
- per-request determinism: z and the Gumbel draw derive from the REQUEST
  seed (not the batch composition), so a building's output is bit-identical
  whether it shared its batch or not (asserted in tests; requires the
  per-graph normalization default, i.e. Q1/Q5 batch-level quirks OFF).

Results are per-voxel arrays in the request's own node order.
"""

from __future__ import annotations

import threading
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Configuration
from ..data import grid as gridlib
from ..ops.gumbel import gumbel_softmax_st
from . import batcher as batcherlib


class InferenceServer:
    """Load weights once, serve concurrent single-building requests batched."""

    def __init__(
        self,
        configuration: Configuration,
        params_g,
        max_batch: int = 16,
        max_delay_ms: float = 2.0,
        seed: int = 0,
    ):
        cfg = configuration
        assert cfg.LAYOUT == "grid", "serving uses the grid fast path"
        assert not cfg.BATCH_LEVEL_MATCHING and not cfg.BATCH_LEVEL_GRAPHNORM, (
            "batch-level quirk modes make outputs depend on batchmates; "
            "serve with the per-graph defaults"
        )
        self.configuration = cfg
        self.params_g = jax.device_put(params_g)
        self.params_version = 0
        self.max_batch = max_batch
        self._batcher = batcherlib.make_batcher(max_batch, int(max_delay_ms * 1000))
        from ..utils.prng import apply_prng_impl

        apply_prng_impl(getattr(cfg, "PRNG_IMPL", "auto"), inference=True)  # hw RNG ok: no training dynamics
        self._base_key = jax.random.key(seed)

        from ..models import GridVoxelGNNGenerator

        gen = GridVoxelGNNGenerator(configuration=cfg)
        F, Y, X = cfg.GRID_SHAPE

        def serve_fn(params, batch, seeds):
            # per-request z: derived from each request's seed, independent of
            # where in the batch the request landed
            kz, kg = jax.random.split(self._base_key)

            from ..ops.rng import normal_box_muller

            def z_for(s):
                return normal_box_muller(
                    jax.random.fold_in(kz, s), (F, Y, X, cfg.Z_DIM), dtype=jnp.float32
                )

            z = jax.vmap(z_for)(seeds)
            logits, _, _ = gen.apply(
                {"params": params}, batch, z,
                deterministic=True, rngs={"gumbel": kg},
            )

            def sample(lg, s):
                return gumbel_softmax_st(lg, jax.random.fold_in(kg, s), tau=1.0)

            hard, soft = jax.vmap(sample)(logits, seeds)
            return logits, hard, soft

        self._serve = jax.jit(serve_fn)

        self._lock = threading.Lock()
        self._next_id = 0
        self._staged: dict = {}
        self._results: dict = {}
        self._thread: Optional[threading.Thread] = None
        self.batch_sizes: list = []  # diagnostics: sizes of executed batches

    # ------------------------------------------------------------------
    def start(self) -> "InferenceServer":
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()
        return self

    def stop(self) -> None:
        self._batcher.shutdown()
        if self._thread is not None:
            self._thread.join(timeout=30)
        self._batcher.close()  # frees the native handle (batcher.cc sb_destroy)

    # ------------------------------------------------------------------
    def swap_params(self, params_g) -> int:
        """Checkpoint hot-swap: atomically replace the served generator weights.

        In-flight micro-batches finish on the weights they started with; the
        next batch the executor forms uses the new ones.  No recompile — the
        jitted program is parameterised on the weights, so a swap is one
        device_put + an attribute store (atomic under the GIL).  Returns the
        new version number.
        """
        new = jax.device_put(params_g)
        with self._lock:
            self.params_g = new
            self.params_version += 1
            return self.params_version

    # ------------------------------------------------------------------
    def _run(self) -> None:
        while True:
            try:
                ids = self._batcher.next_batch()
            except (StopIteration, RuntimeError):
                return
            if not ids:
                continue
            with self._lock:
                # a timed-out request may have withdrawn its staged entry
                pairs = [(i, self._staged.pop(i)) for i in ids if i in self._staged]
            if not pairs:
                self._batcher.complete(ids)
                continue
            ids = [i for i, _ in pairs]
            reqs = [r for _, r in pairs]
            try:
                samples = [(r[0], r[1]) for r in reqs]
                seeds = np.array([r[2] for r in reqs], np.int32)
                seeds = np.pad(seeds, (0, self.max_batch - len(seeds)))
                batch = gridlib.pack_grid(
                    samples, self.configuration, batch_slots=self.max_batch
                )
                logits, hard, soft = self._serve(self.params_g, batch, jnp.array(seeds))
                logits, hard, soft = (
                    np.array(logits), np.array(hard), np.array(soft)
                )
                with self._lock:
                    for slot, (i, (local, voxel)) in enumerate(zip(ids, samples)):
                        pos = voxel.location.astype(int)
                        f_, y_, x_ = pos[:, 0], pos[:, 1], pos[:, 2]
                        self._results[i] = {
                            "logits": logits[slot, f_, y_, x_],
                            "label_hard": hard[slot, f_, y_, x_],
                            "label_soft": soft[slot, f_, y_, x_],
                            "types": np.argmax(hard[slot, f_, y_, x_], axis=-1),
                        }
                self.batch_sizes.append(len(ids))
            except Exception as exc:  # noqa: BLE001 — isolate the poison batch
                # a failing batch fails ITS requests (error propagated to each
                # waiting infer() call); the executor itself survives
                with self._lock:
                    for i in ids:
                        self._results[i] = {"error": exc}
            finally:
                self._batcher.complete(ids)

    # ------------------------------------------------------------------
    def infer(self, local, voxel, seed: int = 0, timeout_s: float = 120.0) -> dict:
        """Blocking single-building inference (thread-safe).

        Returns per-voxel arrays in the request's node order:
        ``{"logits": (n,7), "label_hard": (n,7), "label_soft": (n,7),
        "types": (n,)}``.

        Raises ``ValueError`` at submit time for buildings that cannot fit
        the server's static shapes (instead of wedging the executor), and
        re-raises any executor-side failure of this request's batch.
        """
        cfg = self.configuration
        F, Y, X = cfg.GRID_SHAPE
        loc = np.asarray(voxel.location)
        if loc.shape[0] == 0:
            raise ValueError("building has no voxels")
        extent = loc.max(axis=0) + 1
        if (loc.min() < 0) or (extent > np.array([F, Y, X])).any():
            raise ValueError(
                f"building extent {tuple(int(e) for e in extent)} exceeds the "
                f"server grid {cfg.GRID_SHAPE}; resize or use a larger-grid server"
            )
        n_local = np.asarray(local.x).shape[0]
        if n_local > cfg.GRID_LOCAL_NODES:
            raise ValueError(
                f"program graph has {n_local} nodes > GRID_LOCAL_NODES="
                f"{cfg.GRID_LOCAL_NODES}"
            )

        with self._lock:
            rid = self._next_id
            self._next_id += 1
            self._staged[rid] = (local, voxel, seed)
        self._batcher.submit(rid)
        try:
            self._batcher.wait(rid, int(timeout_s * 1e6))
        except Exception:
            # withdraw so a late-executing batch skips us, and drop any
            # result that raced in — no leaked _staged/_results entries
            with self._lock:
                self._staged.pop(rid, None)
                self._results.pop(rid, None)
            raise
        with self._lock:
            result = self._results.pop(rid)
        if "error" in result:
            raise RuntimeError(f"inference batch failed: {result['error']}") from result["error"]
        return result
