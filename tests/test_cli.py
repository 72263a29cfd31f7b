"""CLI + analyzer tests: synth -> preprocess -> analyze pipeline, viz render."""

import json
import os

import numpy as np
import pytest

from building_gan_tpu.cli.main import main
from building_gan_tpu.config import Configuration
from building_gan_tpu.utils.analyze import analyze_dataset


@pytest.fixture(scope="module")
def raw_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("cli")
    main(["synth", "--num", "5", "--data-path", str(root / "raw"), "--seed", "3"])
    return root


def test_synth_layout(raw_root):
    raw = raw_root / "raw"
    assert sorted(os.listdir(raw)) == ["global_graph_data", "local_graph_data", "voxel_data"]
    files = os.listdir(raw / "global_graph_data")
    assert len(files) == 5
    with open(raw / "global_graph_data" / sorted(files)[0]) as f:
        g = json.load(f)
    assert set(g) == {"far", "site_area", "global_node"}


def test_preprocess_cli(raw_root):
    main([
        "preprocess",
        "--data-path", str(raw_root / "raw"),
        "--save-data-path", str(raw_root / "proc"),
    ])
    files = os.listdir(raw_root / "proc")
    assert len(files) == 10  # 5 local + 5 voxel


def test_analyze(raw_root, capsys):
    cfg = Configuration(DATA_PATH=str(raw_root / "raw"))
    stats = analyze_dataset(cfg)
    assert stats["num_buildings"] == 5
    assert abs(sum(stats["type_ratios"].values()) - 1.0) < 1e-6
    assert stats["floor_range"][0] >= 0 and stats["floor_range"][1] <= 10
    out = capsys.readouterr().out
    assert "FAR invariant       : OK" in out


def test_analyze_far_violation(tmp_path):
    """A corrupted FAR must trip the invariant assertion (analyze.py:76-79)."""
    from building_gan_tpu.data.synthetic import write_dataset

    root = str(tmp_path / "raw")
    write_dataset(root, 1, seed=9)
    gp = os.path.join(root, "global_graph_data", "graph_global_000000.json")
    with open(gp) as f:
        g = json.load(f)
    g["far"] = g["far"] * 2 + 1
    with open(gp, "w") as f:
        json.dump(g, f)
    cfg = Configuration(DATA_PATH=root)
    with pytest.raises(AssertionError):
        analyze_dataset(cfg)


def test_viz_cli(raw_root):
    main([
        "viz", "--num", "1",
        "--data-path", str(raw_root / "raw"),
        "--out-dir", str(raw_root / "viz"),
    ])
    files = os.listdir(raw_root / "viz")
    assert files and files[0].endswith(".png")


def test_build_config_flag_mapping():
    """The round-4 train flags map onto their config fields (incl. the
    GRID_BUCKETS shape parser)."""
    import argparse

    from building_gan_tpu.cli.main import _build_config

    args = argparse.Namespace(
        grid_buckets="6x6x6,11x12x12",
        device_resident=True,
        ckpt_latest_interval=25,
        slot_graphs=6,
        grid_local_nodes=448,
        hourglass_min_channels=32,
    )
    cfg = _build_config(args)
    assert cfg.GRID_BUCKETS == ((6, 6, 6), (11, 12, 12))
    assert cfg.DEVICE_RESIDENT_DATA is True
    assert cfg.CKPT_LATEST_INTERVAL == 25
    assert cfg.GRID_SLOT_GRAPHS == 6
    assert cfg.GRID_LOCAL_NODES == 448
    assert cfg.HOURGLASS_MIN_CHANNELS == 32
