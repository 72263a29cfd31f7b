"""Benchmark: batched inference throughput in buildings/sec.

The second headline metric (BASELINE.json): generator forward at full
reference dims (GAT hourglass 7x128) over the dense-grid fast path,
512 buildings per batch, deterministic eval (no dropout), Gumbel sampling
included (the reference's inference path samples labels the same way,
`trainer.py:769-770`).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference publishes no batched-inference throughput.  Pinned
estimate: its test loop (`trainer.py:762-779`) runs one G forward per
512-graph batch (~204k merged voxel nodes through 14 GAT layers) plus
sklearn metrics on host — order 2 s/batch on its single GPU ≈ 250
buildings/s.  Pinned at 250.0.
"""

from __future__ import annotations

import json
import time


REFERENCE_BASELINE_BUILDINGS_PER_SEC = 250.0


def main():
    import jax

    from building_gan_tpu.config import Configuration
    from building_gan_tpu.data import grid as gridlib
    from building_gan_tpu.data import preprocess, synthetic
    from building_gan_tpu.models import GridVoxelGNNGenerator

    B = 512
    cfg = Configuration(GRID_SHAPE=(10, 6, 6), GRID_BATCH=B, GRID_LOCAL_NODES=64)

    samples = []
    i = 0
    while len(samples) < B:
        g, l, v = synthetic.generate_building(i)
        samples.append(preprocess.process_building(g, l, v, cfg, f"{i:06d}"))
        i += 1
    batch = jax.device_put(gridlib.pack_grid(samples, cfg))

    gen = GridVoxelGNNGenerator(configuration=cfg)
    key = jax.random.key(0)
    z = jax.random.normal(key, batch.mask.shape + (cfg.Z_DIM,))
    init = jax.jit(lambda rngs, b, zz: gen.init(rngs, b, zz, deterministic=True))
    params = init({"params": key, "gumbel": key, "dropout": key}, batch, z)["params"]

    @jax.jit
    def infer(params, batch, key):
        kz, kg = jax.random.split(key)
        z = jax.random.normal(kz, batch.mask.shape + (cfg.Z_DIM,))
        logits, hard, soft = gen.apply(
            {"params": params}, batch, z, deterministic=True, rngs={"gumbel": kg}
        )
        return jax.numpy.argmax(hard, axis=-1)

    out = infer(params, batch, key)
    _ = int(out[0, 0, 0, 0])  # host sync

    n_steps = 20
    t0 = time.perf_counter()
    for s in range(n_steps):
        out = infer(params, batch, jax.random.fold_in(key, s))
    _ = int(out[0, 0, 0, 0])
    dt = time.perf_counter() - t0

    buildings_per_sec = B * n_steps / dt
    print(
        json.dumps(
            {
                "metric": "batched_inference_buildings_per_sec",
                "value": round(buildings_per_sec, 1),
                "unit": "buildings/sec",
                "vs_baseline": round(buildings_per_sec / REFERENCE_BASELINE_BUILDINGS_PER_SEC, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
