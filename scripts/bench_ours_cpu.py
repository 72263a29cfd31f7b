"""Measure THIS framework's training throughput on the host CPU.

The like-for-like half of the measured baseline pair (VERDICT r3 missing #3):
`scripts/bench_reference.py` times the reference's `_train_each_epoch`
(torch 2.13 CPU) on N preprocessed buildings; this script times our fully
jitted WGAN-GP train step (`train/step.py`) over the SAME preprocessed
buildings (same NPZ dir, same graphs-per-batch, same N_CRITIC=5 semantics)
with `JAX_PLATFORMS=cpu`.  nodes/s = real (non-padding) merged voxel nodes
per wall second, the same accounting as both other benches.

Usage:
    JAX_PLATFORMS=cpu python scripts/bench_ours_cpu.py \
        [--graphs 512] [--batches 2] [--data /tmp/bgt_demo]

Output: one JSON line (reference_cpu-comparable). Results of record live in
docs/baselines/ and are cited by bench.py's baseline note.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--graphs", type=int, default=512)
    ap.add_argument("--batches", type=int, default=2)
    ap.add_argument("--data", default="/tmp/bgt_demo",
                    help="demo_train root (raw/ + processed/ as synthesized "
                    "by scripts/demo_train.py)")
    args = ap.parse_args()

    import jax

    # this host's sitecustomize pins jax_platforms='axon,cpu' regardless of
    # JAX_PLATFORMS; override via jax.config BEFORE any backend initializes
    # (same pattern as tests/conftest.py) so this really measures the CPU.
    jax.config.update("jax_platforms", "cpu")

    from building_gan_tpu.config import Configuration
    from building_gan_tpu.data.pipeline import GraphDataLoaders
    from building_gan_tpu.models import GridVoxelGNNDiscriminator, GridVoxelGNNGenerator
    from building_gan_tpu.train.state import create_train_state
    from building_gan_tpu.train.step import make_train_step

    cfg = Configuration(
        DATA_PATH=os.path.join(args.data, "raw"),
        SAVE_DATA_PATH=os.path.join(args.data, "processed"),
        GRID_SHAPE=(10, 6, 6),
        GRID_BATCH=args.graphs,
        GRID_LOCAL_NODES=64,
        LOG_DIR="/tmp/bench_ours_cpu_logs",
    )
    loaders = GraphDataLoaders(cfg)
    batches = list(loaders.train_dataloader)[: args.batches + 1]
    if len(batches) < args.batches + 1:
        raise SystemExit(
            f"need {args.batches + 1} train batches of {args.graphs} graphs "
            f"under {args.data} (have {len(batches)}); synthesize more with "
            f"scripts/demo_train.py --buildings <N>"
        )

    gen = GridVoxelGNNGenerator(configuration=cfg)
    disc = GridVoxelGNNDiscriminator(configuration=cfg)
    state, tx_g, tx_d = create_train_state(
        cfg, gen, disc, batches[0], jax.random.key(cfg.SEED), cfg.EPOCHS
    )
    step = jax.jit(make_train_step(cfg, gen, disc, tx_g, tx_d), donate_argnums=(0,))

    # compile + warmup on batch 0 (excluded from timing)
    t0 = time.perf_counter()
    state, m = step(state, batches[0], jax.random.key(1))
    jax.block_until_ready(m["g_loss"])
    warm_s = time.perf_counter() - t0

    per_batch_s, per_batch_nodes = [], []
    for i, batch in enumerate(batches[1:]):
        nodes = int(batch.mask.sum())
        t0 = time.perf_counter()
        state, m = step(state, batch, jax.random.key(2 + i))
        jax.block_until_ready(m["g_loss"])
        dt = time.perf_counter() - t0
        per_batch_s.append(dt)
        per_batch_nodes.append(nodes)
        print(f"# batch: {args.graphs} graphs, {nodes} real voxel nodes, "
              f"{dt:.2f}s -> {nodes / dt:,.0f} nodes/s", file=sys.stderr)

    total_nodes = sum(per_batch_nodes)
    total_s = sum(per_batch_s)
    print(json.dumps({
        "metric": "ours_train_voxel_nodes_per_sec_cpu",
        "value": round(total_nodes / total_s, 1),
        "unit": "nodes/sec",
        "detail": {
            "what": "this repo's jitted WGAN-GP train step (train/step.py), "
                    "XLA CPU backend, same preprocessed buildings as "
                    "scripts/bench_reference.py",
            "graphs_per_batch": args.graphs,
            "batches": args.batches,
            "n_critic": cfg.N_CRITIC,
            "nodes_per_batch": per_batch_nodes,
            "batch_seconds": [round(s, 2) for s in per_batch_s],
            "compile_warmup_s": round(warm_s, 1),
            "backend": jax.default_backend(),
            "cpus": os.cpu_count(),
        },
    }))


if __name__ == "__main__":
    main()
