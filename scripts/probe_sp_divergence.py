"""Diagnose test_sp_train_step_matches_unsharded divergence.

Compares the GSPMD floor-sharded WGAN-GP train step against the unsharded
jitted step (the exact test_sp.py setup) and decomposes WHERE the update
divergence comes from:

- rel/cos for params_g and params_d separately;
- N_CRITIC=0 (pure G update, no critic compounding) vs N_CRITIC=2;
- float64 run: a sharding LOGIC bug (dropped halo, wrong reduction) keeps
  rel O(1) in x64, while f32 reassociation amplification collapses to ~1e-9.

Usage: python scripts/probe_sp_divergence.py [--x64]
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")  # == the test's fixture
X64 = "--x64" in sys.argv
if X64:
    jax.config.update("jax_enable_x64", True)

import numpy as np
import optax

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from building_gan_tpu.config import Configuration
from building_gan_tpu.data import grid as gridlib
from building_gan_tpu.data import preprocess, synthetic
from building_gan_tpu.models import GridVoxelGNNDiscriminator, GridVoxelGNNGenerator
from building_gan_tpu.parallel import sp
from building_gan_tpu.train.state import create_train_state
from building_gan_tpu.train.step import make_train_step


def updates(p0, p1):
    return np.concatenate(
        [
            (np.asarray(a1, np.float64) - np.asarray(a0, np.float64)).ravel()
            for a0, a1 in zip(jax.tree.leaves(p0), jax.tree.leaves(p1))
        ]
    )


def relcos(u1, u2):
    rel = np.linalg.norm(u1 - u2) / max(np.linalg.norm(u1), 1e-30)
    cos = float(u1 @ u2 / max(np.linalg.norm(u1) * np.linalg.norm(u2), 1e-30))
    return rel, cos


def run(n_critic):
    cfg = Configuration(
        GRID_SHAPE=(8, 8, 8),
        GRID_BATCH=2,
        GRID_LOCAL_NODES=64,
        PACK_GRAPHS=2,
        COMPUTE_DTYPE="float64" if X64 else "float32",
        PARAM_DTYPE="float64" if X64 else "float32",
        N_CRITIC=n_critic,
        GENERATOR_ENCODER_REPEAT=2,
        GENERATOR_HIDDEN_DIM=32,
        LOCAL_ENCODER_HIDDEN_DIM=32,
        Z_DIM=16,
        GENERATOR_MLP_ENCODER_REPEAT=1,
        LOCAL_GRAPH_ENCODER_REPEAT=1,
        DISCRIMINATOR_ENCODER_REPEAT=2,
        DISCRIMINATOR_HIDDEN_DIM=32,
    )
    # same buildings as the test fixture (seeds 1000+i, floors < 8)
    samples = []
    i = 0
    while len(samples) < 2 and i < 8:
        g, l, v = synthetic.generate_building(seed=1000 + i)
        s = preprocess.process_building(g, l, v, cfg, f"{i:06d}")
        if int(s[1].location[:, 0].max()) < 8:
            samples.append(s)
        i += 1
    gb = gridlib.pack_grid(samples, cfg)

    gen = GridVoxelGNNGenerator(configuration=cfg)
    disc = GridVoxelGNNDiscriminator(configuration=cfg)
    state, _, _ = create_train_state(cfg, gen, disc, gb, jax.random.key(0), 10)
    if X64:
        state = jax.tree.map(
            lambda a: a.astype(np.float64) if np.issubdtype(a.dtype, np.floating) else a, state
        )
    tx_g = optax.sgd(1e-2)
    tx_d = optax.sgd(1e-2)
    state = state.replace(opt_g=tx_g.init(state.params_g), opt_d=tx_d.init(state.params_d))

    p_g0 = jax.tree.map(np.array, state.params_g)
    p_d0 = jax.tree.map(np.array, state.params_d)

    single = jax.jit(make_train_step(cfg, gen, disc, tx_g, tx_d))
    s1, m1 = single(state, gb, jax.random.key(7))

    sp_mesh = sp.make_sp_mesh(4)
    sp_step = sp.make_sp_train_step(cfg, gen, disc, tx_g, tx_d, sp_mesh)
    s2, m2 = sp_step(state, gb, jax.random.key(7))

    ug1, ug2 = updates(p_g0, s1.params_g), updates(p_g0, s2.params_g)
    ud1, ud2 = updates(p_d0, s1.params_d), updates(p_d0, s2.params_d)
    rg, cg = relcos(ug1, ug2)
    rd, cd = relcos(ud1, ud2)
    print(
        f"N_CRITIC={n_critic} x64={X64}: "
        f"params_g rel={rg:.3e} cos={cg:.6f} |u|={np.linalg.norm(ug1):.3e} ; "
        f"params_d rel={rd:.3e} cos={cd:.6f} |u|={np.linalg.norm(ud1):.3e} ; "
        f"g_loss {float(m1['g_loss']):.6f}/{float(m2['g_loss']):.6f} "
        f"d_loss {float(m1['d_loss']):.6f}/{float(m2['d_loss']):.6f}",
        flush=True,
    )


if __name__ == "__main__":
    run(0)
    run(2)
