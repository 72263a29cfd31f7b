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
