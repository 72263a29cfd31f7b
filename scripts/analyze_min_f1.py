"""Per-class / per-building breakdown of the test-split min per-graph F1.

VERDICT r4 missing #3: the ref10k runs land macro F1 0.9964/0.9969 (vs the
reference's 0.99871, `building_gan/src/trainer.py:787-795` printout) but min
per-graph F1 0.71-0.81 vs 0.8373 — the one published metric still below.
This tool answers WHICH buildings and WHICH classes drive the minimum, so
TRAINING.md can say whether it is the rare-class synthetic-data effect or a
real training deficit.

Protocol: evaluates the best-gated checkpoint on the (seeded, cfg.SEED)
test split with the same one-z-draw-per-batch evaluation the reference
`Trainer.test` uses (`trainer.py:762-779`), but keeps the per-building 7x7
confusion matrices (metrics.grid_confusion_matrices) instead of reducing
them — each building keeps its data_number through the packing plan, so the
report names real buildings.

Usage:
    python scripts/analyze_min_f1.py --root /tmp/bgt_ref10k \
        --log-dir runs/ref10k-rbgfull [--seed 777] [--platform cpu] \
        [--out docs/baselines/minf1_ref10k_s777.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))


def _scores_np(cm: np.ndarray) -> dict:
    """sklearn-macro scores from one (7,7) CM (host mirror of
    metrics._scores_from_cm, incl. the present-label-set semantics)."""
    tp = np.diag(cm).astype(np.float64)
    sup_t = cm.sum(axis=1).astype(np.float64)
    sup_p = cm.sum(axis=0).astype(np.float64)
    present = (sup_t + sup_p) > 0
    prec = np.where(sup_p > 0, tp / np.maximum(sup_p, 1.0), 0.0)
    rec = np.where(sup_t > 0, tp / np.maximum(sup_t, 1.0), 0.0)
    pr = prec + rec
    f1 = np.where(pr > 0, 2 * prec * rec / np.maximum(pr, 1e-12), 0.0)
    n = max(int(present.sum()), 1)
    return {
        "f1": float((f1 * present).sum() / n),
        "per_class_f1": f1.tolist(),
        "per_class_recall": rec.tolist(),
        "per_class_precision": prec.tolist(),
        "support_true": sup_t.astype(int).tolist(),
        "support_pred": sup_p.astype(int).tolist(),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/bgt_ref10k")
    ap.add_argument("--log-dir", required=True)
    ap.add_argument("--buildings", type=int, default=10000)
    ap.add_argument("--grid-batch", type=int, default=512)
    ap.add_argument("--seed", type=int, default=777,
                    help="config SEED of the run (drives the 65/25/10 split)")
    ap.add_argument("--prng", default="auto")
    ap.add_argument("--worst", type=int, default=20)
    ap.add_argument("--draws", type=int, default=1,
                    help="z draws per building; >1 keeps each building's "
                         "best-F1 draw (the reference's best-of-k protocol, "
                         "trainer.py:65-84 — viz-only there; metrics of "
                         "record use --draws 1)")
    ap.add_argument("--platform", default=None)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    import jax

    from building_gan_tpu.config import PROGRAM_NAMES, Configuration
    from building_gan_tpu.data import grid as gridlib
    from building_gan_tpu.data.pipeline import GraphDataLoaders
    from building_gan_tpu.data.preprocess import create_dataset
    from building_gan_tpu.data.synthetic import write_dataset
    from building_gan_tpu.models import (
        GridVoxelGNNDiscriminator,
        GridVoxelGNNGenerator,
    )
    from building_gan_tpu.train import metrics as M
    from building_gan_tpu.train.trainer import Trainer

    raw = os.path.join(args.root, "raw")
    proc = os.path.join(args.root, "processed")
    cfg = Configuration(
        DATA_PATH=raw,
        SAVE_DATA_PATH=proc,
        GRID_SHAPE=(10, 6, 6),
        GRID_BATCH=args.grid_batch,
        GRID_LOCAL_NODES=64,
        LOG_DIR=os.path.dirname(args.log_dir) or ".",
        PRNG_IMPL=args.prng,
        SEED=args.seed,
    )
    if not os.path.isdir(proc) or len(os.listdir(proc)) < 2 * args.buildings:
        print(f"synthesizing {args.buildings} buildings...", file=sys.stderr)
        write_dataset(raw, args.buildings, seed=0)
        create_dataset(cfg, verbose=True, workers=8)

    loaders = GraphDataLoaders(cfg)
    trainer = Trainer(
        GridVoxelGNNGenerator(configuration=cfg),
        GridVoxelGNNDiscriminator(configuration=cfg),
        loaders,
        cfg,
        log_dir=args.log_dir,
    )
    meta = dict(trainer.meta)
    print(f"checkpoint meta: {meta}", file=sys.stderr)

    # Fixed-order packing of the test samples so every (slot, gid) cell maps
    # back to a data_number via the packing plan.
    test_samples = list(loaders.test_dataloader.samples)
    K = cfg.GRID_SLOT_GRAPHS
    B = cfg.GRID_BATCH
    base = jax.random.key(cfg.SEED + 31337)  # same family as Trainer.test

    if K > 1:  # bin-packed slots: (slot, gid) -> sample via the plan
        slots = gridlib.plan_packing_slots(test_samples, cfg)
        windows = [
            (slots[i : i + B], None) for i in range(0, len(slots), B)
        ]
    else:  # one building per slot: slot index IS the sample index
        windows = [
            (None, list(range(i, min(i + B, len(test_samples)))))
            for i in range(0, len(test_samples), B)
        ]

    rows = []  # one dict per real building
    for bi, (window, idxs) in enumerate(windows):
        if window is not None:
            batch = gridlib.pack_grid_multi_from_slots(
                test_samples, window, cfg, batch_slots=B
            )
        else:
            batch = gridlib.pack_grid([test_samples[i] for i in idxs], cfg)
        batch = jax.device_put(batch)
        gmask = np.asarray(batch.graph_mask)
        best = None  # per-building best-F1 draw (dict list)
        for d in range(args.draws):
            key = jax.random.fold_in(base, bi * args.draws + d)
            _, hard, _ = trainer.generate(batch, key)
            pred = np.asarray(jnp_argmax(hard))
            cms = np.asarray(
                M.grid_confusion_matrices(
                    batch.type, pred, batch.mask, batch.gid, K
                )
            )  # (B, K, 7, 7) multi-packed, else (B, 7, 7)
            scored = []
            if window is not None:
                for si, slot in enumerate(window):
                    for gi, (sample_idx, _) in enumerate(slot.placed):
                        assert gmask[si, gi] > 0
                        s = _scores_np(cms[si, gi])
                        s["data_number"] = test_samples[sample_idx][1].data_number
                        scored.append(s)
            else:
                for si, sample_idx in enumerate(idxs):
                    assert gmask[si] > 0
                    s = _scores_np(cms[si])
                    s["data_number"] = test_samples[sample_idx][1].data_number
                    scored.append(s)
            if best is None:
                best = scored
            else:
                best = [b if b["f1"] >= s["f1"] else s for b, s in zip(best, scored)]
        rows.extend(best)
        print(
            f"batch {bi}: {len(rows)} buildings scored", file=sys.stderr
        )

    rows.sort(key=lambda r: r["f1"])
    f1s = np.array([r["f1"] for r in rows])

    # aggregate: which classes fail, overall vs the worst decile
    total_cm = np.zeros((7, 7))
    # (recomputable from rows' supports only diagonally; keep per-class
    # recall/precision means instead)
    per_class_recall_all = np.array([r["per_class_recall"] for r in rows])
    sup_all = np.array([r["support_true"] for r in rows], dtype=np.float64)
    worst_decile = rows[: max(len(rows) // 10, 1)]
    per_class_recall_w = np.array([r["per_class_recall"] for r in worst_decile])
    sup_w = np.array([r["support_true"] for r in worst_decile], dtype=np.float64)

    def _mean_where_present(recalls, sups):
        pres = sups > 0
        out = []
        for c in range(7):
            m = pres[:, c]
            out.append(float(recalls[m, c].mean()) if m.any() else None)
        return out

    class_names = [PROGRAM_NAMES[c] for c in range(7)]

    report = {
        "checkpoint_meta": {k: (float(v) if hasattr(v, "item") else v)
                            for k, v in meta.items()},
        "seed": args.seed,
        "draws": args.draws,
        "n_test_buildings": len(rows),
        "f1_macro_mean": float(f1s.mean()),
        "f1_min": float(f1s.min()),
        "f1_p10": float(np.percentile(f1s, 10)),
        "f1_median": float(np.median(f1s)),
        "class_names": class_names,
        "mean_class_recall_all": _mean_where_present(per_class_recall_all, sup_all),
        "mean_class_recall_worst_decile": _mean_where_present(per_class_recall_w, sup_w),
        "mean_support_per_class": sup_all.mean(axis=0).tolist(),
        "worst_buildings": [
            {
                "data_number": r["data_number"],
                "f1": round(r["f1"], 4),
                "per_class_f1": [round(v, 3) for v in r["per_class_f1"]],
                "per_class_recall": [round(v, 3) for v in r["per_class_recall"]],
                "support_true": r["support_true"],
                # classes present with f1 == 0 are the macro-F1 killers
                "zero_f1_classes": [
                    c for c in range(7)
                    if (r["support_true"][c] > 0 or r["support_pred"][c] > 0)
                    and r["per_class_f1"][c] == 0.0
                ],
                "n_voxels": int(sum(r["support_true"])),
            }
            for r in rows[: args.worst]
        ],
    }
    _ = total_cm
    out = json.dumps(report)
    print(out)
    if args.out:
        with open(args.out, "w") as f:
            f.write(out + "\n")


def jnp_argmax(hard):
    """one-hot hard labels (B, F, Y, X, 7) -> class ids."""
    import jax.numpy as jnp

    return jnp.argmax(hard, axis=-1)


if __name__ == "__main__":
    main()
