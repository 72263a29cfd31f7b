"""Benchmark: training throughput in voxel-graph nodes/sec/chip.

Runs the full-size Building-GAN configuration (GAT hourglass G 7x128 /
D 3x64, N_CRITIC=5, WGAN-GP — reference `config.py:63-106`) as one fully
jitted step per grid bucket on the default backend (TPU when available) and
reports real (non-padding) voxel nodes processed per second per chip.

Uses the dense-grid stencil path (`building_gan_tpu/ops/stencil.py`) — the
TPU-native layout for irregular-voxel-grid graphs (the edge-list fallback
measures ~250x slower per conv layer on TPU because XLA scatters serialize) —
with GRID_BUCKETS routing: buildings go to the smallest fitting grid shape
(one compiled program per bucket), which is how the production pipeline cuts
padding waste (`data/pipeline.py`).  The reported number is the
bucket-weighted aggregate: total real nodes per epoch / total step time.

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

B = 512  # reference batch size of record (config.py:63)
BUCKETS = ((5, 6, 6), (10, 6, 6))  # smallest-fit routing, like the pipeline


def _bench_bucket(shape, group, n_steps=10):
    import jax

    from building_gan_tpu.config import Configuration
    from building_gan_tpu.data import grid as gridlib
    from building_gan_tpu.models import GridVoxelGNNDiscriminator, GridVoxelGNNGenerator
    from building_gan_tpu.train.state import create_train_state
    from building_gan_tpu.train.step import make_train_step

    cfg = Configuration(GRID_SHAPE=shape, GRID_BATCH=B, GRID_LOCAL_NODES=64)
    group = (group * ((B // len(group)) + 1))[:B]
    batch = jax.device_put(gridlib.pack_grid(group, cfg))
    real_nodes = int(np.asarray(batch.mask).sum())

    gen = GridVoxelGNNGenerator(configuration=cfg)
    disc = GridVoxelGNNDiscriminator(configuration=cfg)
    state, tx_g, tx_d = create_train_state(cfg, gen, disc, batch, jax.random.key(0), 1000)
    step = jax.jit(make_train_step(cfg, gen, disc, tx_g, tx_d), donate_argnums=(0,))

    # warmup / compile (host transfer is the only reliable sync on this backend)
    state, metrics = step(state, batch, jax.random.key(0))
    _ = float(metrics["g_loss"])

    t0 = time.perf_counter()
    for s in range(1, n_steps + 1):
        state, metrics = step(state, batch, jax.random.fold_in(jax.random.key(1), s))
    _ = float(metrics["g_loss"])
    dt = (time.perf_counter() - t0) / n_steps
    return real_nodes, dt


def main():
    from building_gan_tpu.config import Configuration
    from building_gan_tpu.data import preprocess, synthetic

    cfg0 = Configuration(GRID_BATCH=B, GRID_LOCAL_NODES=64)
    samples = []
    i = 0
    while len(samples) < 2 * B:
        g, l, v = synthetic.generate_building(i)
        samples.append(preprocess.process_building(g, l, v, cfg0, f"{i:06d}"))
        i += 1

    # smallest-fit bucket routing (mirrors data/pipeline.py GRID_BUCKETS)
    groups = {shape: [] for shape in BUCKETS}
    for s in samples:
        ext = s[1].location.max(axis=0) + 1
        for shape in BUCKETS:
            if (ext <= np.array(shape)).all():
                groups[shape].append(s)
                break

    total_nodes = 0.0
    total_time = 0.0
    for shape, group in groups.items():
        if not group:
            continue
        real_nodes, dt = _bench_bucket(shape, group)
        weight = len(group) / B  # batches of this shape per epoch (per 512)
        total_nodes += real_nodes * weight
        total_time += dt * weight

    nodes_per_sec = total_nodes / total_time
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
