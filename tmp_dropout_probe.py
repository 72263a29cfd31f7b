import time
import numpy as np
import jax
from building_gan_tpu.config import Configuration
from building_gan_tpu.data import grid as gridlib, preprocess, synthetic
from building_gan_tpu.models import GridVoxelGNNDiscriminator, GridVoxelGNNGenerator
from building_gan_tpu.train.state import create_train_state
from building_gan_tpu.train.step import make_train_step

N = 128
samples = []
for i in range(N):
    g, l, v = synthetic.generate_building_real_scale(i)
    samples.append(preprocess.process_building(g, l, v, Configuration(), f"{i:06d}"))

for rate, label in ((0.2, "dropout 0.2"), (0.0, "dropout 0.0")):
    cfg = Configuration(GRID_SHAPE=(11,12,12), GRID_SLOT_GRAPHS=1, GRID_LOCAL_NODES=64,
                        ENCODER_DROPOUT_RATE=rate)
    batch = jax.device_put(gridlib.pack_grid(samples, cfg.replace(GRID_BATCH=N)))
    gen = GridVoxelGNNGenerator(configuration=cfg)
    disc = GridVoxelGNNDiscriminator(configuration=cfg)
    state, tx_g, tx_d = create_train_state(cfg, gen, disc, batch, jax.random.key(0), 1000)
    step = jax.jit(make_train_step(cfg, gen, disc, tx_g, tx_d), donate_argnums=(0,))
    state, m = step(state, batch, jax.random.key(0)); _=float(m["g_loss"])
    t0=time.perf_counter()
    for s in range(6):
        state, m = step(state, batch, jax.random.fold_in(jax.random.key(1), s))
    _=float(m["g_loss"])
    print(f"{label}: {(time.perf_counter()-t0)/6*1e3:.1f} ms/step", flush=True)
