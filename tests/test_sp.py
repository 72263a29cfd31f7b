"""Node-axis (floor) sharding tests on the 8-virtual-CPU mesh (parallel/sp.py).

Two layers of proof:
- the explicit ppermute halo-exchange stencils match the unsharded stencils
  bit-for-bit on every cell;
- the GSPMD path (sharding annotations only, zero manual comms) produces the
  same generator logits as the unsharded forward, and its compiled module
  really contains cross-shard collectives (the partitioner inserted the
  ghost-plane exchange instead of an all-gather-everything fallback).
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from building_gan_tpu.data import grid as gridlib
from building_gan_tpu.models import GridVoxelGNNGenerator
from building_gan_tpu.ops import stencil
from building_gan_tpu.parallel import sp

from test_train import tiny_cfg

N_SHARDS = 4


@pytest.fixture(scope="module")
def sp_mesh():
    return sp.make_sp_mesh(N_SHARDS)


def _rand_slab(rng, b=2, f=8, y=6, x=6, c=16):
    h = jnp.array(rng.normal(size=(b, f, y, x, c)).astype(np.float32))
    mask = jnp.array((rng.random((b, f, y, x)) > 0.3).astype(np.float32))
    return h * mask[..., None], mask


@pytest.mark.parametrize("op", ["gat", "gcn", "sum", "gatv2"])
def test_halo_stencils_match_unsharded(sp_mesh, op):
    rng = np.random.default_rng(0)
    h, mask = _rand_slab(rng)
    a_src = jnp.array(rng.normal(size=mask.shape).astype(np.float32))
    a_dst = jnp.array(rng.normal(size=mask.shape).astype(np.float32))
    h2 = jnp.array(rng.normal(size=h.shape).astype(np.float32)) * mask[..., None]
    att = jnp.array(rng.normal(size=(h.shape[-1],)).astype(np.float32))

    if op == "gat":
        want = stencil.stencil_gat(h, a_src, a_dst, mask)
        fn = lambda *xs: sp.stencil_gat_sp(*xs)
        args, specs = (h, a_src, a_dst, mask), (P(None, sp.SP_AXIS),) * 4
    elif op == "gcn":
        want = stencil.stencil_gcn(h, mask)
        fn = lambda *xs: sp.stencil_gcn_sp(*xs)
        args, specs = (h, mask), (P(None, sp.SP_AXIS),) * 2
    elif op == "sum":
        want = stencil.stencil_sum(h, mask)
        fn = lambda *xs: sp.stencil_sum_sp(*xs)
        args, specs = (h, mask), (P(None, sp.SP_AXIS),) * 2
    else:
        want = stencil.stencil_gatv2(h, h2, att, mask)
        fn = lambda hl, hr, m: sp.stencil_gatv2_sp(hl, hr, att, m)
        args, specs = (h, h2, mask), (P(None, sp.SP_AXIS),) * 3

    sharded = jax.jit(
        jax.shard_map(fn, mesh=sp_mesh, in_specs=specs, out_specs=P(None, sp.SP_AXIS))
    )
    got = sharded(*args)
    np.testing.assert_allclose(np.array(got), np.array(want), rtol=1e-5, atol=1e-6)


def test_sp_generator_forward_matches_unsharded(synthetic_samples, small_cfg, sp_mesh):
    """GSPMD: floor-sharded batch + replicated params == unsharded logits."""
    cfg = tiny_cfg(
        small_cfg,
        GRID_SHAPE=(8, 8, 8),  # floor extent divisible by the 4-shard mesh
        GRID_BATCH=2,
        GRID_LOCAL_NODES=64,
        PACK_GRAPHS=2,
        COMPUTE_DTYPE="float32",  # strict cross-program parity
    )
    samples = [s for s in synthetic_samples if int(s[1].location[:, 0].max()) < 8][:2]
    assert len(samples) == 2, "fixture buildings exceed 8 floors"
    gb = gridlib.pack_grid(samples, cfg)

    gen = GridVoxelGNNGenerator(configuration=cfg)
    key = jax.random.key(0)
    z = jax.random.normal(jax.random.key(1), gb.mask.shape + (cfg.Z_DIM,))
    variables = gen.init({"params": key, "gumbel": key}, gb, z, deterministic=True)
    want, _, _ = gen.apply(variables, gb, z, deterministic=True, rngs={"gumbel": key})

    apply_sp = sp.sp_generator_apply(gen, sp_mesh)
    got, _, _ = apply_sp(variables["params"], gb, z, key)
    np.testing.assert_allclose(np.array(got), np.array(want), rtol=1e-4, atol=1e-5)


def test_sp_train_step_matches_unsharded(
    synthetic_samples, small_cfg, sp_mesh, highest_precision
):
    """The FULL WGAN-GP train step under floor sharding (GSPMD) == the
    unsharded jitted step: same losses, same updated parameters.  Closes
    SURVEY.md §2.3(b) beyond the forward (VERDICT r2 #7) — the critic loop,
    GP double-backward through the halo stencils, and both optimizer updates
    all run partitioned."""
    from building_gan_tpu.models import GridVoxelGNNDiscriminator
    from building_gan_tpu.train.state import create_train_state
    from building_gan_tpu.train.step import make_train_step

    cfg = tiny_cfg(
        small_cfg,
        GRID_SHAPE=(8, 8, 8),
        GRID_BATCH=2,
        GRID_LOCAL_NODES=64,
        PACK_GRAPHS=2,
        COMPUTE_DTYPE="float32",  # strict cross-program parity
        N_CRITIC=2,
    )
    samples = [s for s in synthetic_samples if int(s[1].location[:, 0].max()) < 8][:2]
    gb = gridlib.pack_grid(samples, cfg)

    gen = GridVoxelGNNGenerator(configuration=cfg)
    disc = GridVoxelGNNDiscriminator(configuration=cfg)
    state, _, _ = create_train_state(cfg, gen, disc, gb, jax.random.key(0), 10)
    # SGD for the cross-program comparison: Adam normalizes each update to
    # ~±lr regardless of gradient magnitude, so float-noise sign flips in
    # near-zero gradient components (different XLA partitionings round
    # differently) would read as full-size param mismatches.  SGD keeps the
    # param delta proportional to the gradient, which is what this test is
    # actually asserting equivalence of.
    import optax

    tx_g = optax.sgd(1e-2)
    tx_d = optax.sgd(1e-2)
    state = state.replace(opt_g=tx_g.init(state.params_g), opt_d=tx_d.init(state.params_d))

    p_g0 = jax.tree.map(np.array, state.params_g)
    p_d0 = jax.tree.map(np.array, state.params_d)

    single = jax.jit(make_train_step(cfg, gen, disc, tx_g, tx_d))
    s1, m1 = single(state, gb, jax.random.key(7))

    sp_step = sp.make_sp_train_step(cfg, gen, disc, tx_g, tx_d, sp_mesh)

    # the partitioned step must really be sharded: collectives in the HLO.
    # Lower BEFORE executing sp_step — its jit donates the state buffers
    # (device_put aliases the device-0 buffer, so the donation consumes the
    # caller's state too; standard train-loop donation semantics).
    hlo = sp_step.jitted.lower(
        jax.device_put(state, jax.sharding.NamedSharding(sp_mesh, P())),
        sp.shard_grid_batch(gb, sp_mesh),
        jax.random.key(7),
    ).compile().as_text()
    assert any(c in hlo for c in ("collective-permute", "all-reduce", "all-gather"))

    s2, m2 = sp_step(state, gb, jax.random.key(7))

    # rtol 5e-3: the ST-Gumbel argmax is discontinuous in float rounding, so
    # the partitioned program can flip near-tie hard labels vs the unsharded
    # compile, shifting critic means by O(1e-3) (see test_parallel.py).
    for k in ("g_loss", "d_loss", "f1", "accuracy"):
        assert np.isclose(float(m1[k]), float(m2[k]), rtol=5e-3, atol=5e-3), k

    # Parameter UPDATES are compared as vectors (relative Frobenius error +
    # cosine), not element-wise: the WGAN-GP double-backward on an untrained
    # critic produces gradients spanning ~5 orders of magnitude, and the
    # partitioned program's cross-shard reductions reassociate f32 sums, so
    # individual near-zero components carry O(1e-2) relative noise.  A real
    # sharding bug (dropped halo plane, double-counted shard, wrong grad
    # reduction) shifts the update NORM/direction at O(1), which this
    # assertion catches; reassociation noise does not.
    def assert_updates_match(p0, pa, pb, what, rel_tol, cos_tol):
        diff2 = na2 = nb2 = dot = 0.0
        for a0, a1, a2 in zip(
            jax.tree.leaves(p0), jax.tree.leaves(pa), jax.tree.leaves(pb)
        ):
            u1 = (np.array(a1) - a0).ravel()
            u2 = (np.array(a2) - a0).ravel()
            diff2 += float(np.sum((u1 - u2) ** 2))
            na2 += float(np.sum(u1 * u1))
            nb2 += float(np.sum(u2 * u2))
            dot += float(np.sum(u1 * u2))
        rel = diff2**0.5 / max(na2**0.5, 1e-12)
        cos = dot / max(na2**0.5 * nb2**0.5, 1e-12)
        assert rel < rel_tol and cos > cos_tol, (what, rel, cos)

    # The critic updates themselves are well-conditioned: measured rel
    # ~2.6e-4 across compiles (scripts/probe_sp_divergence.py).
    assert_updates_match(p_d0, s1.params_d, s2.params_d, "params_d", 3e-3, 0.9999)
    # The G update after N_CRITIC>0 critic updates is NOT: the G adversarial
    # gradient is the critic's INPUT-gradient, and the benign ~2.6e-4
    # cross-compile divergence in critic params amplifies ~460x through the
    # GP-shaped curvature.  Proven without sharding: perturbing the critic by
    # rel 2.6e-4 inside the UNSHARDED program moves the G update by rel 0.119
    # / cos 0.993 (scripts/probe_sp_divergence2.py).  Assert direction only;
    # magnitude is asserted on the well-conditioned N_CRITIC=0 comparison
    # below, which pins the sharded G/GP path itself at tight tolerance.
    assert_updates_match(p_g0, s1.params_g, s2.params_g, "params_g", 0.5, 0.95)

    # --- pure G update (N_CRITIC=0): the sharded G gradient itself ---------
    # With the critic untouched the comparison is well-conditioned (measured
    # rel 3.4e-5); this is the assertion that catches a real sharding bug in
    # the generator/GP path at tight tolerance.
    cfg0 = tiny_cfg(
        small_cfg,
        GRID_SHAPE=(8, 8, 8),
        GRID_BATCH=2,
        GRID_LOCAL_NODES=64,
        PACK_GRAPHS=2,
        COMPUTE_DTYPE="float32",
        N_CRITIC=0,
    )
    state0, _, _ = create_train_state(cfg0, gen, disc, gb, jax.random.key(0), 10)
    state0 = state0.replace(opt_g=tx_g.init(state0.params_g), opt_d=tx_d.init(state0.params_d))
    pg0 = jax.tree.map(np.array, state0.params_g)
    s1g, _ = jax.jit(make_train_step(cfg0, gen, disc, tx_g, tx_d))(
        state0, gb, jax.random.key(7)
    )
    sp_step0 = sp.make_sp_train_step(cfg0, gen, disc, tx_g, tx_d, sp_mesh)
    s2g, _ = sp_step0(state0, gb, jax.random.key(7))
    assert_updates_match(pg0, s1g.params_g, s2g.params_g, "params_g_pure", 3e-3, 0.9999)


def test_sp_generator_compiles_with_collectives(synthetic_samples, small_cfg, sp_mesh):
    """The partitioned module must contain cross-shard collectives — proof the
    floor sharding survives into the compiled program (no silent replication)."""
    cfg = tiny_cfg(
        small_cfg, GRID_SHAPE=(8, 8, 8), GRID_BATCH=2, GRID_LOCAL_NODES=64,
        PACK_GRAPHS=2, COMPUTE_DTYPE="float32",
    )
    samples = [s for s in synthetic_samples if int(s[1].location[:, 0].max()) < 8][:2]
    gb = gridlib.pack_grid(samples, cfg)
    gen = GridVoxelGNNGenerator(configuration=cfg)
    key = jax.random.key(0)
    z = jax.random.normal(jax.random.key(1), gb.mask.shape + (cfg.Z_DIM,))
    variables = gen.init({"params": key, "gumbel": key}, gb, z, deterministic=True)

    apply_sp = sp.sp_generator_apply(gen, sp_mesh)
    params = jax.device_put(variables["params"], jax.sharding.NamedSharding(sp_mesh, P()))
    batch = sp.shard_grid_batch(gb, sp_mesh)
    zs = jax.device_put(z, jax.sharding.NamedSharding(sp_mesh, P(None, sp.SP_AXIS)))
    compiled = apply_sp.jitted.lower(params, batch, zs, key).compile()
    hlo = compiled.as_text()
    assert any(
        coll in hlo for coll in ("collective-permute", "all-reduce", "all-gather")
    ), "no cross-shard collectives in the partitioned module"


def test_sp_generator_forward_with_packed_gemms(synthetic_samples, small_cfg, sp_mesh):
    """PACK_NARROW_GEMMS under GSPMD floor sharding: packed_matmul's row-fold
    reshape merges (B, R) — R is the sharded axis — so GSPMD must repartition
    without changing values.  Parity vs the unsharded packed forward."""
    cfg = tiny_cfg(
        small_cfg,
        GRID_SHAPE=(8, 8, 8),
        GRID_BATCH=2,
        GRID_LOCAL_NODES=64,
        PACK_GRAPHS=2,
        COMPUTE_DTYPE="float32",
        PACK_NARROW_GEMMS=True,
    )
    samples = [s for s in synthetic_samples if int(s[1].location[:, 0].max()) < 8][:2]
    gb = gridlib.pack_grid(samples, cfg)

    gen = GridVoxelGNNGenerator(configuration=cfg)
    key = jax.random.key(0)
    z = jax.random.normal(jax.random.key(1), gb.mask.shape + (cfg.Z_DIM,))
    variables = gen.init({"params": key, "gumbel": key}, gb, z, deterministic=True)
    want, _, _ = gen.apply(variables, gb, z, deterministic=True, rngs={"gumbel": key})

    apply_sp = sp.sp_generator_apply(gen, sp_mesh)
    got, _, _ = apply_sp(variables["params"], gb, z, key)
    np.testing.assert_allclose(np.array(got), np.array(want), rtol=1e-4, atol=1e-5)
