"""Is the G-update divergence in test_sp_train_step_matches_unsharded real
or amplification?  Decisive experiment with NO sharding involved:

Run the UNSHARDED train step twice from critic params perturbed by the
relative magnitude the sharded/unsharded critics actually diverge by after
the critic loop (measured 2.6e-4, probe_sp_divergence.py), and measure how
far the G update moves.  If a benign 2.6e-4 critic perturbation moves the
G update by ~0.1+, the cross-program G-update divergence is inherent
conditioning of "G adv gradient = critic input-gradient", not a sharding bug.

Usage: python scripts/probe_sp_divergence2.py
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np
import optax

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from building_gan_tpu.config import Configuration
from building_gan_tpu.data import grid as gridlib
from building_gan_tpu.data import preprocess, synthetic
from building_gan_tpu.models import GridVoxelGNNDiscriminator, GridVoxelGNNGenerator
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


def main():
    cfg = Configuration(
        GRID_SHAPE=(8, 8, 8),
        GRID_BATCH=2,
        GRID_LOCAL_NODES=64,
        PACK_GRAPHS=2,
        COMPUTE_DTYPE="float32",
        N_CRITIC=0,  # G update only: critic params enter as-is
        GENERATOR_ENCODER_REPEAT=2,
        GENERATOR_HIDDEN_DIM=32,
        LOCAL_ENCODER_HIDDEN_DIM=32,
        Z_DIM=16,
        GENERATOR_MLP_ENCODER_REPEAT=1,
        LOCAL_GRAPH_ENCODER_REPEAT=1,
        DISCRIMINATOR_ENCODER_REPEAT=2,
        DISCRIMINATOR_HIDDEN_DIM=32,
    )
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
    tx_g = optax.sgd(1e-2)
    tx_d = optax.sgd(1e-2)
    state = state.replace(opt_g=tx_g.init(state.params_g), opt_d=tx_d.init(state.params_d))

    # Pre-train the critic 2 steps (like the test's N_CRITIC=2) so D is in the
    # same post-GP-update regime when we measure G-grad sensitivity to it.
    cfg2 = cfg.replace(N_CRITIC=2)
    pre = jax.jit(make_train_step(cfg2, gen, disc, tx_g, tx_d))
    s_pre, _ = pre(state, gb, jax.random.key(7))
    state = state.replace(params_d=s_pre.params_d, opt_d=s_pre.opt_d)

    p_g0 = jax.tree.map(np.array, state.params_g)
    single = jax.jit(make_train_step(cfg, gen, disc, tx_g, tx_d))

    s_base, _ = single(state, gb, jax.random.key(7))
    u_base = updates(p_g0, s_base.params_g)

    # Relative perturbation of the critic params at the measured
    # cross-program divergence scale, then re-run the SAME compiled step.
    rng = np.random.default_rng(99)
    for eps in (1e-5, 2.6e-4, 1e-3):
        flat, tree = jax.tree.flatten(state.params_d)
        pert = [
            np.asarray(a) * (1.0 + eps * rng.standard_normal(a.shape).astype(np.float32))
            for a in flat
        ]
        state_p = state.replace(params_d=jax.tree.unflatten(tree, pert))
        s_p, _ = single(state_p, gb, jax.random.key(7))
        u_p = updates(p_g0, s_p.params_g)
        rel, cos = relcos(u_base, u_p)
        print(
            f"critic perturbed rel eps={eps:.1e}: G update rel={rel:.3e} cos={cos:.6f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
