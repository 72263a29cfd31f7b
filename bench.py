"""Benchmark: training throughput in voxel-graph nodes/sec/chip.

Runs the full-size Building-GAN configuration (GAT hourglass G 7x128 /
D 3x64, N_CRITIC=5, WGAN-GP — reference `config.py:63-106`) as one fully
jitted step on the default backend (TPU when available) and reports real
(non-padding) voxel nodes processed per second per chip.

Uses the dense-grid stencil path (`building_gan_tpu/ops/stencil.py`) — the
TPU-native layout for the irregular-voxel-grid graphs (the edge-list path is
the general fallback; it measures ~250x slower per conv layer on TPU because
XLA scatters serialize).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference publishes no training throughput (its runs/_base logs
are LFS pointers without payload — BASELINE.md).  The pinned baseline constant
is the analytic estimate from SURVEY.md §6: one reference batch pushes ~204k
merged voxel nodes through 22 network traversals (6 G fwd + 16 D fwd + 6 bwd,
`trainer.py:459-495`); at a measured-class ~1.4 s/batch on the reference's
single GPU that is ~146k nodes/s — rounded to 150_000 nodes/sec.
"""

from __future__ import annotations

import json
import time

import numpy as np

REFERENCE_BASELINE_NODES_PER_SEC = 150_000.0


def main():
    import jax

    from building_gan_tpu.config import Configuration
    from building_gan_tpu.data import grid as gridlib
    from building_gan_tpu.data import preprocess, synthetic
    from building_gan_tpu.models import GridVoxelGNNDiscriminator, GridVoxelGNNGenerator
    from building_gan_tpu.train.state import create_train_state
    from building_gan_tpu.train.step import make_train_step

    # Full reference model dims; grid bucket sized to the synthetic data
    # (floors <= 10, y/x <= 6); 256 buildings per step.
    B = 512  # reference batch size of record (config.py:63)
    cfg = Configuration(GRID_SHAPE=(10, 6, 6), GRID_BATCH=B, GRID_LOCAL_NODES=64)

    samples = []
    i = 0
    while len(samples) < B:
        g, l, v = synthetic.generate_building(i)
        samples.append(preprocess.process_building(g, l, v, cfg, f"{i:06d}"))
        i += 1
    batch = gridlib.pack_grid(samples, cfg)
    real_nodes = int(batch.mask.sum())

    gen = GridVoxelGNNGenerator(configuration=cfg)
    disc = GridVoxelGNNDiscriminator(configuration=cfg)
    state, tx_g, tx_d = create_train_state(cfg, gen, disc, batch, jax.random.key(0), 1000)
    step = jax.jit(make_train_step(cfg, gen, disc, tx_g, tx_d), donate_argnums=(0,))

    batch = jax.device_put(batch)

    # warmup / compile (host transfer is the only reliable sync on this backend)
    state, metrics = step(state, batch, jax.random.key(0))
    _ = float(metrics["g_loss"])

    n_steps = 10
    t0 = time.perf_counter()
    for s in range(1, n_steps + 1):
        state, metrics = step(state, batch, jax.random.fold_in(jax.random.key(1), s))
    _ = float(metrics["g_loss"])
    dt = time.perf_counter() - t0

    nodes_per_sec = real_nodes * n_steps / dt
    print(
        json.dumps(
            {
                "metric": "train_voxel_nodes_per_sec_per_chip",
                "value": round(nodes_per_sec, 1),
                "unit": "nodes/sec/chip",
                "vs_baseline": round(nodes_per_sec / REFERENCE_BASELINE_NODES_PER_SEC, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
