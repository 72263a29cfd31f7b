"""Evaluate a training checkpoint on the test split (reference notebook
parity — `building_gan/src/trainer.py:787-795` prints the same metric set).

Use when a long run ended (or was stopped) without reaching demo_train's
final `trainer.test()` call: loads the best-gated `states.msgpack` from
--log-dir and prints the test-split metrics JSON.

Usage: python scripts/eval_checkpoint.py --root /tmp/bgt_ref10k \
           --log-dir runs/ref10k-rbgfull [--grid-batch 512]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/bgt_demo")
    ap.add_argument("--log-dir", required=True)
    ap.add_argument("--grid-batch", type=int, default=512)
    ap.add_argument("--prng", default="auto")
    ap.add_argument("--platform", default=None,
                    help="force a jax platform (e.g. cpu — evaluate a "
                         "checkpoint when the TPU tunnel is down)")
    args = ap.parse_args()

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    from building_gan_tpu.config import Configuration
    from building_gan_tpu.data.pipeline import GraphDataLoaders
    from building_gan_tpu.models import (
        GridVoxelGNNDiscriminator,
        GridVoxelGNNGenerator,
    )
    from building_gan_tpu.train.trainer import Trainer

    cfg = Configuration(
        DATA_PATH=os.path.join(args.root, "raw"),
        SAVE_DATA_PATH=os.path.join(args.root, "processed"),
        GRID_SHAPE=(10, 6, 6),
        GRID_BATCH=args.grid_batch,
        GRID_LOCAL_NODES=64,
        LOG_DIR=os.path.dirname(args.log_dir) or ".",
        PRNG_IMPL=args.prng,
    )
    loaders = GraphDataLoaders(cfg)
    trainer = Trainer(
        GridVoxelGNNGenerator(configuration=cfg),
        GridVoxelGNNDiscriminator(configuration=cfg),
        loaders,
        cfg,
        log_dir=args.log_dir,
    )
    meta = dict(trainer.meta)
    out = trainer.test(num_samples_to_viz=0)
    print(json.dumps({"checkpoint_meta": meta, "test": out}))


if __name__ == "__main__":
    main()
