"""Test configuration: force an 8-virtual-device CPU backend.

Multi-chip TPU hardware is not available in CI; JAX's host-platform device
splitting is the fake backend for exercising mesh sharding and collectives
(SURVEY.md §4).  Must run before jax initializes.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# The environment's sitecustomize registers the (tunneled) TPU backend and
# pins jax_platforms='axon,cpu' regardless of JAX_PLATFORMS, so tests must
# override via jax.config BEFORE any backend is initialized — otherwise every
# eager op round-trips through the TPU tunnel (~20s/op).
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402
import numpy as np  # noqa: E402

# ---------------------------------------------------------------------------
# Test tiers (VERDICT r3 weak #6): the full non-slow suite takes ~30 min on
# this 1-CPU backend; `pytest -m core` is the fast inner-loop tier (<8 min).
# Heavy modules are the mesh/SP/Pallas/e2e/parity compiles; everything else
# (minus @slow) is core.  README "Tests" documents both tiers.
# ---------------------------------------------------------------------------
HEAVY_MODULES = {
    "test_e2e",
    "test_parallel",
    "test_sp",
    "test_gat_train",
    "test_pallas",
    "test_multipack",
    "test_reference_model_parity",
    "test_reference_parity",
    "test_serving",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        mod = item.module.__name__.rsplit(".", 1)[-1]
        if mod in HEAVY_MODULES:
            item.add_marker(pytest.mark.heavy)
        elif (
            item.get_closest_marker("slow") is None
            and item.get_closest_marker("heavy") is None
        ):
            item.add_marker(pytest.mark.core)

from building_gan_tpu.config import Configuration  # noqa: E402
from building_gan_tpu.data import preprocess, synthetic  # noqa: E402


@pytest.fixture
def highest_precision():
    """Full-f32 matmuls for cross-compilation equivalence tests.

    At DEFAULT precision this backend's dots carry bf16-class rounding
    (measured 4.6e-2 max err on a 48x8 f32 dot) that differs between
    separately compiled programs — any test comparing an oracle compiled
    separately from the program under test needs this."""
    with jax.default_matmul_precision("highest"):
        yield


@pytest.fixture(scope="session")
def small_cfg():
    """Config with small packing budgets suited to synthetic test buildings."""
    return Configuration(
        LAYOUT="edges",
        PACK_GRAPHS=4,
        PACK_LOCAL_NODES=256,
        PACK_LOCAL_EDGES=2048,
        PACK_VOXEL_NODES=2048,
        PACK_VOXEL_EDGES=16384,
    )


@pytest.fixture(scope="session")
def synthetic_samples(small_cfg):
    """Eight preprocessed synthetic buildings."""
    out = []
    for i in range(8):
        g, l, v = synthetic.generate_building(seed=1000 + i)
        local, voxel = preprocess.process_building(g, l, v, small_cfg, f"{i:06d}")
        out.append((local, voxel))
    return out
