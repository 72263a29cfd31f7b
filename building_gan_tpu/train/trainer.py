"""Trainer: the epoch loop with TB observability and best-gated checkpoints.

Mirrors the reference training runtime (`building_gan/src/trainer.py:580-806`)
on top of the fully jitted step:

- per epoch: train over every packed batch (the 5-critic + G update loop runs
  INSIDE one XLA program — the reference pays ~22 python-dispatched network
  passes per batch, `trainer.py:459-495`), then a no-update validation pass;
- checkpoint criterion ``0.05 * min_train_f1 + 1.0 * min_val_f1``
  (reference `trainer.py:675-678`, weights `config.py:78-79`);
- the same 14 TensorBoard scalar tags per epoch (`trainer.py:680-693`),
  config dump as text (`trainer.py:644-646`), and best-epoch image strips;
- auto-resume from ``log_dir`` on construction (`trainer.py:628-636`), with
  the quirk-Q11 epoch_start patch on non-improving epochs.
"""

from __future__ import annotations

import os
import time
from collections import defaultdict
from functools import wraps
from typing import Callable, Optional

import jax
import numpy as np

from ..checkpoint import ckpt
from ..config import Configuration
from ..data.pipeline import GraphDataLoaders, prefetch
from ..parallel import dp
from . import metrics as M
from .state import cosine_lr, create_train_state, set_g_lr
from .step import make_eval_step, make_train_step


def runtime_calculator(func: Callable) -> Callable:
    """Wall-clock decorator (reference trainer.py:31-50)."""

    @wraps(func)
    def wrapper(*args, **kwargs):
        start = time.time()
        result = func(*args, **kwargs)
        print(f"The function {func.__name__} took {time.time() - start} seconds to run.")
        return result

    return wrapper


class Trainer:
    """Adversarial trainer with checkpoint/resume and TB logging.

    Construction mirrors the reference
    ``Trainer(generator, discriminator, dataloaders, ..., configuration,
    log_dir)`` (`trainer.py:580-600`); optimizers are built internally from
    the configuration (Adam + cosine G schedule, reference train.py:36-38).
    """

    def __init__(
        self,
        generator,
        discriminator,
        dataloaders: GraphDataLoaders,
        configuration: Configuration,
        log_dir: Optional[str] = None,
        mesh=None,
    ):
        from ..utils.cache import enable_compilation_cache
        from ..utils.prng import apply_prng_impl

        enable_compilation_cache()  # reuse compiled steps across runs/resumes
        apply_prng_impl(getattr(configuration, "PRNG_IMPL", "auto"))  # auto -> threefry (see utils/prng.py)
        self.generator = generator
        self.discriminator = discriminator
        self.dataloaders = dataloaders
        self.configuration = configuration
        self.sanity_checking = configuration.SANITY_CHECKING
        self.mesh = mesh

        if log_dir is None:
            log_dir = os.path.join(configuration.LOG_DIR, time.strftime("%m-%d-%Y__%H-%M-%S"))
        self.log_dir = log_dir

        cfg = configuration
        steps_per_epoch = max(self.dataloaders.train_dataloader.num_packs_per_epoch(), 1)
        if mesh is not None:
            steps_per_epoch = max(steps_per_epoch // mesh.devices.size, 1)
        total_g_updates = cfg.EPOCHS * steps_per_epoch

        sample_pack = next(iter(self.dataloaders.train_dataloader))
        if mesh is not None:
            sample_pack_single = jax.tree.map(lambda x: x[0], sample_pack)
        else:
            sample_pack_single = sample_pack

        key = jax.random.key(cfg.SEED)
        self.state, self.tx_g, self.tx_d = create_train_state(
            cfg, generator, discriminator, sample_pack_single, key, total_g_updates
        )

        if mesh is not None:
            self.train_step = dp.make_parallel_train_step(
                cfg, generator, discriminator, self.tx_g, self.tx_d, mesh
            )
        else:
            jit_kwargs = {}
            if getattr(cfg, "USE_PALLAS_TRAIN", False):
                from ..ops.pallas.gat_train import TRAIN_COMPILER_OPTIONS

                jit_kwargs["compiler_options"] = TRAIN_COMPILER_OPTIONS
            self.train_step = jax.jit(
                make_train_step(cfg, generator, discriminator, self.tx_g, self.tx_d),
                donate_argnums=(0,),
                **jit_kwargs,
            )
        if mesh is not None:
            # sharded eval: whole stacked batch in one program, psum-ed scores
            self.eval_step = dp.make_parallel_eval_step(cfg, generator, discriminator, mesh)
        else:
            self.eval_step = jax.jit(make_eval_step(cfg, generator, discriminator))

        # auto-resume (reference trainer.py:628-636).  When a periodic
        # "latest" checkpoint (CKPT_LATEST_INTERVAL) is AHEAD of the
        # best-gated one, prefer it: resuming best-gated weights at a later
        # epoch cursor loses every epoch since the last best update (the
        # round-4 ref10k OOM lost 150 epochs that way — TRAINING.md).
        self.meta = {"epoch_start": 1, "best_f1_score": 0.0}
        restored = ckpt.load_states(self.log_dir, self.state)
        latest = ckpt.load_latest(self.log_dir, self.state)
        if latest is not None and (
            restored is None
            or int(latest[1].get("epoch_start", 0))
            > int(restored[1].get("epoch_start", 0))
        ):
            restored, which = latest, "latest"
        else:
            which = "best"
        if restored is not None:
            self.state, meta = restored
            self.meta.update(meta)
            print(f"Loaded {which} states from {self.log_dir}")

    # ------------------------------------------------------------------
    @runtime_calculator
    def _train_each_epoch(self, epoch: int) -> dict:
        # Per-batch metrics stay ON DEVICE until the epoch ends: a
        # device_get inside the loop would block on every step's completion
        # (one host<->device round trip per batch — through a remote-dispatch
        # tunnel that is ~1 s each, 10x the step itself), where deferring the
        # fetch lets XLA queue the whole epoch back-to-back and pays ONE sync.
        per_batch = []
        n = 0
        base = jax.random.fold_in(jax.random.key(self.configuration.SEED), epoch)
        for i, batch in enumerate(prefetch(self.dataloaders.train_dataloader)):
            self.state, metrics = self.train_step(self.state, batch, jax.random.fold_in(base, i))
            per_batch.append(metrics)
            n += 1
        per_batch = jax.device_get(per_batch)
        sums = defaultdict(float)
        f1_min = np.inf
        hist = 0.0
        cm = 0.0
        for metrics in per_batch:
            for k in ("g_loss", "d_loss", "f1", "precision", "recall", "accuracy"):
                sums[k] += float(metrics[k])
            f1_min = min(f1_min, float(metrics["f1_min"]))
            hist = hist + np.asarray(metrics.get("per_graph_f1_hist", 0.0))
            cm = cm + np.asarray(metrics.get("confusion_matrix", 0.0))
        out = {k: v / max(n, 1) for k, v in sums.items()}
        out["f1_min"] = f1_min if np.isfinite(f1_min) else 0.0
        out["f1_hist"] = hist  # epoch-summed per-graph F1 histogram (psum-exact)
        out["cm"] = cm  # epoch-summed 7x7 confusion matrix
        return out

    @runtime_calculator
    def _validate_each_epoch(self, epoch: int) -> dict:
        if self.sanity_checking or self.dataloaders.validation_dataloader is None:
            return {"g_loss": 0.0, "f1": 0.0, "f1_min": 0.0, "precision": 0.0, "recall": 0.0, "accuracy": 0.0}
        per_batch = []
        n = 0
        base = jax.random.fold_in(jax.random.key(self.configuration.SEED + 999), epoch)
        for i, batch in enumerate(self.dataloaders.validation_dataloader):
            # mesh mode: the stacked batch evaluates in ONE sharded program
            # (scores are psum-ed globally inside the step); fetch deferred
            # to epoch end — see _train_each_epoch.
            per_batch.append(self.eval_step(self.state, batch, jax.random.fold_in(base, i)))
            n += 1
        per_batch = jax.device_get(per_batch)
        sums = defaultdict(float)
        f1_min = np.inf
        hist = 0.0
        cm = 0.0
        for metrics in per_batch:
            for k in ("g_loss", "f1", "precision", "recall", "accuracy"):
                sums[k] += float(metrics[k])
            f1_min = min(f1_min, float(metrics["f1_min"]))
            hist = hist + np.asarray(metrics.get("per_graph_f1_hist", 0.0))
            cm = cm + np.asarray(metrics.get("confusion_matrix", 0.0))
        out = {k: v / max(n, 1) for k, v in sums.items()}
        out["f1_min"] = f1_min if np.isfinite(f1_min) else 0.0
        out["f1_hist"] = hist
        out["cm"] = cm
        return out

    # ------------------------------------------------------------------
    def train(self):
        from tensorboardX import SummaryWriter

        cfg = self.configuration
        writer = SummaryWriter(log_dir=self.log_dir)
        for key, value in cfg.to_dict().items():
            writer.add_text(f"configuration/{key}", str(value))

        epoch_start = int(self.meta.get("epoch_start", 1))
        epoch_end = cfg.EPOCHS + 1
        best_f1_score = float(self.meta.get("best_f1_score", 0.0))

        for epoch in range(epoch_start, epoch_end):
            # per-epoch cosine G LR — exactly the reference CosineAnnealingLR
            # trajectory (train.py:36-38), independent of per-epoch pack counts
            self.state = set_g_lr(self.state, cosine_lr(cfg, epoch))
            tr = self._train_each_epoch(epoch)
            va = self._validate_each_epoch(epoch)

            current_f1_score = (
                tr["f1_min"] * cfg.F1_SCORE_TRAIN_WEIGHT
                + va["f1_min"] * cfg.F1_SCORE_VALIDATION_WEIGHT
            )
            print(
                f"epoch {epoch}: g_loss={tr['g_loss']:.4f} d_loss={tr['d_loss']:.4f} "
                f"f1={tr['f1']:.4f}/{va['f1']:.4f} f1_min={tr['f1_min']:.4f}/{va['f1_min']:.4f} "
                f"acc={tr['accuracy']:.4f}/{va['accuracy']:.4f}",
                flush=True,
            )

            # same scalar tags as the reference (trainer.py:680-693)
            writer.add_scalar("g_loss_train", tr["g_loss"], epoch)
            writer.add_scalar("d_loss_train", tr["d_loss"], epoch)
            writer.add_scalar("g_loss_validation", va["g_loss"], epoch)
            writer.add_scalar("f1_score_train", tr["f1"], epoch)
            writer.add_scalar("f1_score_validation", va["f1"], epoch)
            writer.add_scalar("f1_score_min_train", tr["f1_min"], epoch)
            writer.add_scalar("f1_score_min_validation", va["f1_min"], epoch)
            writer.add_scalar("f1_score_min_weightedsum", current_f1_score, epoch)
            writer.add_scalar("precision_score_train", tr["precision"], epoch)
            writer.add_scalar("precision_score_validation", va["precision"], epoch)
            writer.add_scalar("recall_score_train", tr["recall"], epoch)
            writer.add_scalar("recall_score_validation", va["recall"], epoch)
            writer.add_scalar("accuracy_score_train", tr["accuracy"], epoch)
            writer.add_scalar("accuracy_score_validation", va["accuracy"], epoch)

            # per-class recall from the epoch-summed confusion matrix —
            # beyond-reference observability: the test-split min-F1 is driven
            # by single-voxel rare-class (MECHANICAL_ROOM) instances
            # (docs/baselines/minf1_ref10k_*.json), so the rare-class recall
            # trajectory is the metric that predicts it during training.
            from ..config import PROGRAM_NAMES

            for tag, d in (("train", tr), ("validation", va)):
                cm = np.asarray(d.get("cm", 0.0))
                if cm.ndim != 2:
                    continue
                support = cm.sum(axis=1)
                for c, name in PROGRAM_NAMES.items():
                    if support[c] > 0:
                        writer.add_scalar(
                            f"recall_{name.lower()}_{tag}",
                            float(cm[c, c] / support[c]),
                            epoch,
                        )

            # per-graph F1 distribution (reference logs the per-graph list,
            # trainer.py:418-441; here min/p10/median + a TB histogram come
            # from the psum-exact epoch histogram — sharded runs included)
            for tag, d in (("train", tr), ("validation", va)):
                hist = np.asarray(d.get("f1_hist", 0.0))
                if hist.ndim != 1 or hist.sum() <= 0:
                    continue
                writer.add_scalar(
                    f"f1_score_p10_{tag}", M.hist_quantile(hist, 0.10), epoch
                )
                writer.add_scalar(
                    f"f1_score_median_{tag}", M.hist_quantile(hist, 0.50), epoch
                )
                bins = hist.shape[0]
                centers = (np.arange(bins) + 0.5) / bins
                # the exact epoch min rides alongside the histogram
                # (metrics.py f1_min); hist_quantile(0.0) is a bin-center
                # approximation (±1/2bin) that can disagree with it — use the
                # exact scalar so every "min" in TB is the same number
                # (VERDICT r4 weak #4); p10/median stay histogram-derived.
                writer.add_histogram_raw(
                    f"per_graph_f1_{tag}",
                    min=float(d["f1_min"]),
                    max=float(M.hist_quantile(hist, 1.0)),
                    num=int(hist.sum()),
                    sum=float((hist * centers).sum()),
                    sum_squares=float((hist * centers**2).sum()),
                    bucket_limits=((np.arange(bins) + 1.0) / bins).tolist(),
                    bucket_counts=hist.tolist(),
                    global_step=epoch,
                )

            if best_f1_score < current_f1_score:
                print(f"Best f1 score updated: {best_f1_score} -> {current_f1_score}")
                best_f1_score = current_f1_score

                if self.sanity_checking:
                    fig = self._render_sample(epoch)
                    if fig is not None:
                        writer.add_image(f"epoch_{epoch}", fig, epoch)
                else:
                    ckpt.save_states(
                        self.log_dir,
                        self.state,
                        {
                            "epoch_start": epoch,
                            "epoch_end": epoch_end,
                            "best_f1_score": best_f1_score,
                            "f1_score_train": tr["f1"],
                            "f1_score_validation": va["f1"],
                            "f1_score_min_train": tr["f1_min"],
                            "f1_score_min_validation": va["f1_min"],
                            "f1_score_min_weightedsum": current_f1_score,
                            "recall_score_train": tr["recall"],
                            "recall_score_validation": va["recall"],
                            "accuracy_score_train": tr["accuracy"],
                            "accuracy_score_validation": va["accuracy"],
                        },
                    )
                    fig = self._render_sample(epoch)
                    if fig is not None:
                        writer.add_image(f"epoch_{epoch}", fig, epoch)
            else:
                if not self.sanity_checking and ckpt.exists(self.log_dir):
                    ckpt.patch_epoch_start(self.log_dir, epoch)  # quirk Q11

            interval = int(getattr(cfg, "CKPT_LATEST_INTERVAL", 0) or 0)
            if interval and not self.sanity_checking and epoch % interval == 0:
                ckpt.save_latest(
                    self.log_dir,
                    self.state,
                    {
                        "epoch_start": epoch + 1,
                        "epoch_end": epoch_end,
                        "best_f1_score": best_f1_score,
                        "is_latest": True,
                    },
                )

        writer.close()

    # ------------------------------------------------------------------
    def _render_sample(self, epoch: int):
        """Best-epoch qualitative image (CHW uint8) for TensorBoard."""
        try:
            from ..viz.render import evaluate_qualitatively

            return evaluate_qualitatively(
                self, epoch=epoch, num_samples_to_viz=1, to_tensor=True
            )
        except Exception as e:  # rendering must never kill training
            print(f"render skipped: {e}")
            return None

    def generate(self, batch, key):
        """One generator forward at eval time -> (logits, hard, soft).

        With ``USE_PALLAS`` (grid layout, GATCONV hourglass) the forward runs
        through the fused Pallas hourglass kernel (`models/fast_infer.py`)
        instead of the flax module — same parameter pytree, parity-tested.
        """
        from .losses import _batch_fields

        cfg = self.configuration
        kz, kgum = jax.random.split(key)
        _, mask, _ = _batch_fields(batch)
        from ..ops.rng import normal_box_muller

        z = normal_box_muller(kz, mask.shape + (cfg.Z_DIM,))
        if (
            cfg.USE_PALLAS
            and cfg.LAYOUT == "grid"
            and cfg.GENERATOR_CONV_TYPE == "GATCONV"
            and cfg.GENERATOR_ARCH == "hourglass"
        ):
            from ..models import fast_infer

            step = int(self.state.step)
            if getattr(self, "_fast_infer_step", -1) != step:
                self._fast_infer_packed = fast_infer.prepare(self.state.params_g, cfg)
                self._fast_infer_step = step
            return fast_infer.infer(
                self.state.params_g, self._fast_infer_packed, cfg, batch, z, kgum
            )
        return self.generator.apply(
            {"params": self.state.params_g}, batch, z, deterministic=True, rngs={"gumbel": kgum}
        )

    @runtime_calculator
    def test(self, num_samples_to_viz: int = 0, show: bool = False) -> dict:
        """Test-split metrics printout (reference trainer.py:749-806)."""
        loader = self.dataloaders.test_dataloader
        assert loader is not None, "no test split (sanity mode?)"
        per_batch = []
        n = 0
        base = jax.random.key(self.configuration.SEED + 31337)
        for i, batch in enumerate(loader):
            per_batch.append(self.eval_step(self.state, batch, jax.random.fold_in(base, i)))
            n += 1
        per_batch = jax.device_get(per_batch)  # one sync — see _train_each_epoch
        sums = defaultdict(float)
        f1_min = np.inf
        for metrics in per_batch:
            for k in ("f1", "precision", "recall", "accuracy"):
                sums[k] += float(metrics[k])
            f1_min = min(f1_min, float(metrics["f1_min"]))
        out = {k: v / max(n, 1) for k, v in sums.items()}
        out["f1_min"] = f1_min if np.isfinite(f1_min) else 0.0

        print(
            f"""
            f1_score_test: {out['f1']}
            f1_score_min_test: {out['f1_min']}
            precision_score_test: {out['precision']}
            recall_score_test: {out['recall']}
            accuracy_score_test: {out['accuracy']}
            """
        )

        if num_samples_to_viz > 0:
            from ..viz.render import evaluate_qualitatively

            evaluate_qualitatively(
                self, epoch=None, num_samples_to_viz=num_samples_to_viz,
                use_test_dataset=True, show=show,
            )
        return out
