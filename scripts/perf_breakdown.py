"""Component-wise timing of the WGAN-GP train step on the real TPU.

Decomposes the bench-scale step (512 slots, reference hyperparameters) into
its constituent programs and times each as its own jitted function, so the
parts can be compared against the whole (`docs/PERF.md` — VERDICT r2 #2):

    g_fwd        generator forward (train mode, dropout on)
    d_fwd        discriminator forward
    d_grad       ONE critic update's loss+grad (3 D applications + GP
                 double-backward + G forward under stop_gradient)
    g_grad       generator loss+grad (G fwd/bwd + D fwd + dx backward)
    full_step    the real train step (N_CRITIC d_grads + adam + g_grad + metrics)

Each timing line reports the XLA cost analysis bytes (HBM traffic proxy) so
bandwidth-boundedness is visible per component.  Prints one JSON line.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from building_gan_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from building_gan_tpu.config import Configuration, NUM_CLASSES
from building_gan_tpu.data import grid as gridlib, preprocess, synthetic
from building_gan_tpu.models import GridVoxelGNNDiscriminator, GridVoxelGNNGenerator
from building_gan_tpu.train import losses as L
from building_gan_tpu.train.losses import _batch_fields
from building_gan_tpu.train.state import create_train_state
from building_gan_tpu.train.step import make_train_step
from building_gan_tpu.ops.rng import normal_box_muller

N = int(os.environ.get("PERF_N", "512"))
REPS = int(os.environ.get("PERF_REPS", "8"))

samples = []
for i in range(N):
    g, l, v = synthetic.generate_building_real_scale(i)
    samples.append(preprocess.process_building(g, l, v, Configuration(), f"{i:06d}"))
cfg = Configuration(GRID_SHAPE=(11, 12, 12), GRID_SLOT_GRAPHS=1, GRID_LOCAL_NODES=64)
batch = jax.device_put(gridlib.pack_grid(samples, cfg.replace(GRID_BATCH=N)))

gen = GridVoxelGNNGenerator(configuration=cfg)
disc = GridVoxelGNNDiscriminator(configuration=cfg)
state, tx_g, tx_d = create_train_state(cfg, gen, disc, batch, jax.random.key(0), 1000)

types, mask, _ = _batch_fields(batch)
types_onehot = jax.nn.one_hot(types, NUM_CLASSES, dtype=jnp.float32) * mask[..., None]


def g_forward(params_g, batch, key):
    kz, kgum, kdrop = jax.random.split(key, 3)
    z = normal_box_muller(kz, mask.shape + (cfg.Z_DIM,), dtype=jnp.float32)
    return gen.apply(
        {"params": params_g}, batch, z, deterministic=False,
        rngs={"gumbel": kgum, "dropout": kdrop},
    )


def d_forward(params_d, batch, label, key):
    return disc.apply(
        {"params": params_d}, batch, label, deterministic=False, rngs={"dropout": key}
    )


def d_grad(params_g, params_d, batch, key):
    kgen, kgp, kd = jax.random.split(key, 3)
    _, label_hard, label_soft = g_forward(params_g, batch, kgen)
    label_hard = jax.lax.stop_gradient(label_hard)
    label_soft = jax.lax.stop_gradient(label_soft)

    def loss(pd):
        return L.discriminator_loss(
            lambda lbl: d_forward(pd, batch, lbl, kd),
            types_onehot, label_hard, label_soft, mask, kgp, cfg,
        )

    return jax.value_and_grad(loss)(params_d)


def g_grad(params_g, params_d, batch, key):
    kg, kgd = jax.random.split(key)

    def loss(pg):
        logits, label_hard, _ = g_forward(pg, batch, kg)
        out, _ = L.generator_loss(
            lambda lbl: d_forward(params_d, batch, lbl, kgd), batch, logits, label_hard, cfg
        )
        return out

    return jax.value_and_grad(loss)(params_g)


full_step = make_train_step(cfg, gen, disc, tx_g, tx_d)


def bench(name, fn, *args):
    f = jax.jit(fn)
    t0 = time.perf_counter()
    lowered = f.lower(*args)
    compiled = lowered.compile()
    compile_s = time.perf_counter() - t0
    gb = flops = None
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        gb = float(ca.get("bytes accessed", 0.0)) / 1e9
        flops = float(ca.get("flops", 0.0)) / 1e12
    except Exception:
        pass
    out = compiled(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for r in range(REPS):
        out = compiled(*args)
    jax.block_until_ready(out)
    ms = (time.perf_counter() - t0) / REPS * 1e3
    return {
        "ms": round(ms, 1),
        "cost_gb": round(gb, 1) if gb is not None else None,
        "tflop": round(flops, 3) if flops is not None else None,
        "compile_s": round(compile_s, 1),
    }


key = jax.random.key(7)
results = {}
results["g_fwd"] = bench("g_fwd", g_forward, state.params_g, batch, key)
results["d_fwd"] = bench(
    "d_fwd", d_forward, state.params_d, batch, types_onehot, key
)
results["d_grad"] = bench("d_grad", d_grad, state.params_g, state.params_d, batch, key)
results["g_grad"] = bench("g_grad", g_grad, state.params_g, state.params_d, batch, key)
results["full_step"] = bench("full_step", full_step, state, batch, key)

n_critic = cfg.N_CRITIC
recon = n_critic * results["d_grad"]["ms"] + results["g_grad"]["ms"]
results["_sum_check"] = {
    "n_critic*d_grad + g_grad (ms)": round(recon, 1),
    "full_step (ms)": results["full_step"]["ms"],
}
print(json.dumps(results))
