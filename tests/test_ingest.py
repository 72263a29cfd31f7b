"""Reference processed-``.pt`` ingestion tests (data/ingest.py).

The roundtrip fixture is produced by the ACTUAL reference code
(`DataCreatorHelper.process_data` + ``torch.save``, data.py:216-391,457-461)
on synthetic JSON, so the converter is validated against the real
serialization, not a hand-rolled imitation.
"""

import os
import sys
import types

import numpy as np
import pytest

from test_reference_parity import reference_modules, triplets  # noqa: F401 (fixtures)


@pytest.fixture(scope="module")
def reference_pt_dir(reference_modules, triplets, tmp_path_factory):  # noqa: F811
    import torch

    RefConfiguration, DataCreatorHelper = reference_modules
    ref_cfg = RefConfiguration()
    d = tmp_path_factory.mktemp("ref_pt")
    for i, (g, l, v) in enumerate(triplets):
        num = f"{i:06d}"
        ref_local, ref_voxel = DataCreatorHelper.process_data(g, l, v, ref_cfg, num)
        torch.save(ref_local, os.path.join(d, f"{num}_local.pt"))
        torch.save(ref_voxel, os.path.join(d, f"{num}_voxel.pt"))
    return str(d)


def test_ingest_matches_native_preprocessing(reference_pt_dir, triplets, small_cfg, tmp_path):  # noqa: F811
    """.pt ingestion == running our own preprocessor on the same JSON."""
    from building_gan_tpu.data import preprocess
    from building_gan_tpu.data.ingest import convert_reference_processed
    from building_gan_tpu.data.preprocess import load_local, load_voxel

    dst = str(tmp_path / "npz")
    n = convert_reference_processed(reference_pt_dir, dst)
    assert n == len(triplets)

    for i, (g, l, v) in enumerate(triplets):
        num = f"{i:06d}"
        local = load_local(os.path.join(dst, f"{num}_local.npz"))
        voxel = load_voxel(os.path.join(dst, f"{num}_voxel.npz"))
        want_local, want_voxel = preprocess.process_building(g, l, v, small_cfg, num)

        np.testing.assert_allclose(local.x, want_local.x, rtol=1e-6, atol=1e-7)
        np.testing.assert_array_equal(local.edge_index, want_local.edge_index)
        np.testing.assert_array_equal(local.types, want_local.types)
        assert np.isclose(local.far, want_local.far)
        assert np.isclose(local.site_area, want_local.site_area)
        assert local.data_number == want_local.data_number

        np.testing.assert_allclose(voxel.x, want_voxel.x, rtol=1e-6, atol=1e-7)
        np.testing.assert_array_equal(voxel.edge_index, want_voxel.edge_index)
        np.testing.assert_array_equal(voxel.types, want_voxel.types)
        np.testing.assert_array_equal(voxel.location, want_voxel.location)
        np.testing.assert_allclose(voxel.dimension, want_voxel.dimension, rtol=1e-6)
        assert np.isclose(voxel.far, want_voxel.far)


def test_ingested_dataset_trains(reference_pt_dir, tmp_path, small_cfg):
    """Converted NPZ pairs feed the normal dataset/packing path."""
    from building_gan_tpu.data.ingest import convert_reference_processed
    from building_gan_tpu.data.pipeline import GraphDataset

    dst = str(tmp_path / "npz")
    convert_reference_processed(reference_pt_dir, dst)
    cfg = small_cfg.replace(SAVE_DATA_PATH=dst)
    ds = GraphDataset(cfg)
    assert len(ds) == 4
    local, voxel = ds[0]
    assert local.x.shape[1] == 17 and voxel.x.shape[1] == 12


def test_stub_resolution_without_reference_package(tmp_path):
    """Unpickling works when the reference package is NOT importable: the
    ingest module registers stub classes under the pickled module path."""
    import torch

    from building_gan_tpu.data import ingest

    path = "src.data"
    # simulate a foreign environment: a module we will remove before loading
    saved = {k: sys.modules.get(k) for k in ("src", "src.data")}
    try:
        src = types.ModuleType("src")
        srcdata = types.ModuleType("src.data")

        class LocalGraphData:
            pass

        LocalGraphData.__module__ = path
        LocalGraphData.__qualname__ = "LocalGraphData"
        srcdata.LocalGraphData = LocalGraphData
        sys.modules["src"] = src
        sys.modules["src.data"] = srcdata

        obj = LocalGraphData()
        obj.payload = np.arange(3)
        f = str(tmp_path / "x.pt")
        torch.save(obj, f)
    finally:
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v

    ingest._install_reference_stubs()
    loaded = torch.load(f, map_location="cpu", weights_only=False)
    assert type(loaded).__name__ == "LocalGraphData"
    np.testing.assert_array_equal(loaded.payload, np.arange(3))
