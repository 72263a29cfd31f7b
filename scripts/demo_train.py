"""Demo training run: full reference config on a synthetic 10k-style dataset.

Produces a real `runs/<name>` artifact set (TB events, best-gated
states.msgpack, image strips) and prints per-epoch metrics — the equivalent of
the reference's `_base` run on the synthetic dataset (the reference 10k
dataset ships as an LFS pointer without payload).

Usage: python scripts/demo_train.py [--buildings 2048] [--epochs 60] [...]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--buildings", type=int, default=2048)
    ap.add_argument("--epochs", type=int, default=60)
    ap.add_argument("--grid-batch", type=int, default=512)
    ap.add_argument("--root", default="/tmp/bgt_demo")
    ap.add_argument("--log-dir", default=None)
    ap.add_argument("--batch-level-quirks", action="store_true",
                    help="reference parity mode: Q1 batch-level matching + Q5 batch-level GraphNorm")
    ap.add_argument("--prng", default="auto",
                    help="PRNG impl: auto (hw RNG on TPU) | threefry2x32 | rbg | unsafe_rbg")
    ap.add_argument("--compute-dtype", default=None,
                    help="override COMPUTE_DTYPE (bfloat16 default; float32 for quality probes)")
    ap.add_argument("--gp-dtype", default=None,
                    help="critic dtype inside the GP branch: compute (default) | float32")
    ap.add_argument("--seed", type=int, default=None,
                    help="override config SEED (default 777) for repeat runs")
    ap.add_argument("--ckpt-latest-interval", type=int, default=25,
                    help="crash-recovery checkpoint every N epochs (0 = off; "
                         "best-gated saves always on)")
    ap.add_argument("--device-resident-compositions", type=int, default=1,
                    help="with --device-resident: pre-pack N distinct batch "
                         "compositions, cycled per epoch (1 = frozen)")
    ap.add_argument("--device-resident", action="store_true",
                    help="pack once + keep batches on device (long runs on the "
                         "tunneled backend: avoids its per-transfer host-RAM leak)")
    args = ap.parse_args()

    from building_gan_tpu.config import Configuration
    from building_gan_tpu.data.preprocess import create_dataset
    from building_gan_tpu.data.pipeline import GraphDataLoaders
    from building_gan_tpu.data.synthetic import write_dataset
    from building_gan_tpu.models import GridVoxelGNNDiscriminator, GridVoxelGNNGenerator
    from building_gan_tpu.train.trainer import Trainer

    raw = os.path.join(args.root, "raw")
    proc = os.path.join(args.root, "processed")
    cfg = Configuration(
        DATA_PATH=raw,
        SAVE_DATA_PATH=proc,
        EPOCHS=args.epochs,
        GRID_SHAPE=(10, 6, 6),
        GRID_BATCH=args.grid_batch,
        GRID_LOCAL_NODES=64,
        LOG_DIR=os.path.join(args.root, "runs"),
        BATCH_LEVEL_MATCHING=args.batch_level_quirks,
        BATCH_LEVEL_GRAPHNORM=args.batch_level_quirks,
        PRNG_IMPL=args.prng,
        DEVICE_RESIDENT_DATA=args.device_resident,
        DEVICE_RESIDENT_COMPOSITIONS=args.device_resident_compositions,
        CKPT_LATEST_INTERVAL=args.ckpt_latest_interval,
        **({"COMPUTE_DTYPE": args.compute_dtype} if args.compute_dtype else {}),
        **({"GP_DTYPE": args.gp_dtype} if args.gp_dtype else {}),
        **({"SEED": args.seed} if args.seed is not None else {}),
    )

    if not os.path.isdir(proc) or len(os.listdir(proc)) < 2 * args.buildings:
        print(f"synthesizing {args.buildings} buildings...")
        write_dataset(raw, args.buildings, seed=0)
        create_dataset(cfg, verbose=True, workers=8)

    loaders = GraphDataLoaders(cfg)
    gen = GridVoxelGNNGenerator(configuration=cfg)
    disc = GridVoxelGNNDiscriminator(configuration=cfg)
    log_dir = args.log_dir or os.path.join(args.root, "runs", "demo")
    trainer = Trainer(gen, disc, loaders, cfg, log_dir=log_dir)
    trainer.train()
    out = trainer.test(num_samples_to_viz=0)
    print("TEST:", out)


if __name__ == "__main__":
    main()
