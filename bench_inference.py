"""Benchmark: batched inference throughput in buildings/sec.

The second headline metric (BASELINE.json): generator forward at full
reference dims (GAT hourglass 7x128) over the dense-grid fast path,
512 reference-statistics buildings per batch, deterministic eval (no
dropout), Gumbel sampling included (the reference's inference path samples
labels the same way, `trainer.py:769-770`).

Same throughput levers as the train bench (docs/PERF.md): 3D bin packing
(K=6 buildings per (11,12,12) slot, gap-free cell mode), Box-Muller z in the
compute dtype, TPU hardware RNG.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "detail"}.

Baseline: the reference publishes no batched-inference throughput.  Pinned
estimate: its test loop (`trainer.py:762-779`) runs one G forward per
512-graph batch (~204k merged voxel nodes through 14 GAT layers) plus
sklearn metrics on host — order 2 s/batch on its single GPU ≈ 250
buildings/s.  Pinned at 250.0.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

REFERENCE_BASELINE_BUILDINGS_PER_SEC = 250.0

N_BUILDINGS = 512
SLOT_GRAPHS = int(os.environ.get("BENCH_SLOT_GRAPHS", "6"))
PRNG_IMPL = os.environ.get("BENCH_PRNG", "auto")


def main():
    import jax

    from building_gan_tpu.utils.prng import apply_prng_impl

    prng_impl = apply_prng_impl(PRNG_IMPL, inference=True)

    from building_gan_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from building_gan_tpu.config import Configuration
    from building_gan_tpu.data import grid as gridlib
    from building_gan_tpu.data import preprocess, synthetic
    from building_gan_tpu.models import GridVoxelGNNGenerator
    from building_gan_tpu.ops.rng import normal_box_muller

    dev = jax.devices()[0]

    cfg0 = Configuration()
    samples = []
    for i in range(N_BUILDINGS):
        g, l, v = synthetic.generate_building_real_scale(i)
        samples.append(preprocess.process_building(g, l, v, cfg0, f"{i:06d}"))
    max_local = max(s[0].x.shape[0] for s in samples)

    cfg = Configuration(
        GRID_SHAPE=(11, 12, 12),
        GRID_SLOT_GRAPHS=SLOT_GRAPHS,
        GRID_LOCAL_NODES=int(np.ceil(SLOT_GRAPHS * max_local / 64.0)) * 64,
    )
    if SLOT_GRAPHS > 1:
        slots = gridlib.plan_packing_slots(samples, cfg)
        batch = gridlib.pack_grid_multi_from_slots(samples, slots, cfg, batch_slots=len(slots))
        n_slots = len(slots)
    else:
        batch = gridlib.pack_grid(samples, cfg.replace(GRID_BATCH=N_BUILDINGS))
        n_slots = N_BUILDINGS
    batch = jax.device_put(batch)
    fill_pct = 100.0 * float(np.asarray(batch.mask).sum()) / float(np.prod(batch.mask.shape))

    gen = GridVoxelGNNGenerator(configuration=cfg)
    key = jax.random.key(0)
    z0 = normal_box_muller(key, batch.mask.shape + (cfg.Z_DIM,), dtype=cfg.compute_dtype)
    init = jax.jit(lambda rngs, b, zz: gen.init(rngs, b, zz, deterministic=True))
    params = init({"params": key, "gumbel": key, "dropout": key}, batch, z0)["params"]

    @jax.jit
    def infer(params, batch, key):
        kz, kg = jax.random.split(key)
        z = normal_box_muller(kz, batch.mask.shape + (cfg.Z_DIM,), dtype=cfg.compute_dtype)
        logits, hard, soft = gen.apply(
            {"params": params}, batch, z, deterministic=True, rngs={"gumbel": kg}
        )
        return jax.numpy.argmax(hard, axis=-1)

    t0 = time.perf_counter()
    out = infer(params, batch, key)
    _ = int(out[0, 0, 0, 0])  # host sync
    warmup_s = time.perf_counter() - t0

    n_steps = 20
    block_s = []
    for b in range(3):
        t0 = time.perf_counter()
        for s in range(n_steps):
            out = infer(params, batch, jax.random.fold_in(key, b * n_steps + s))
        _ = int(out[0, 0, 0, 0])
        block_s.append((time.perf_counter() - t0) / n_steps)
    step_s = float(np.median(block_s))

    buildings_per_sec = N_BUILDINGS / step_s
    print(
        json.dumps(
            {
                "metric": "batched_inference_buildings_per_sec",
                "value": round(buildings_per_sec, 1),
                "unit": "buildings/sec",
                "vs_baseline": round(buildings_per_sec / REFERENCE_BASELINE_BUILDINGS_PER_SEC, 3),
                "detail": {
                    "platform": dev.platform,
                    "device_kind": getattr(dev, "device_kind", "unknown"),
                    "buildings": N_BUILDINGS,
                    "slots": n_slots,
                    "graphs_per_slot": SLOT_GRAPHS,
                    "fill_pct": round(fill_pct, 1),
                    "forward_ms": round(1e3 * step_s, 2),
                    "warmup_s": round(warmup_s, 1),
                    "compute_dtype": cfg.COMPUTE_DTYPE,
                    "prng_impl": prng_impl,
                },
            }
        )
    )


if __name__ == "__main__":
    main()
