"""Command-line entry points: preprocess / synth / analyze / train / sanity / test.

The reference exposes its knobs by mutating ``Configuration`` attributes
inside scripts (`train.py:15-16`, `sanity.py:13-15`); here every entry point
takes explicit flags with the same field names and defaults.

Usage:
    python -m building_gan_tpu.cli.main synth --root data/6types-raw_data --num 100
    python -m building_gan_tpu.cli.main preprocess
    python -m building_gan_tpu.cli.main analyze
    python -m building_gan_tpu.cli.main train --epochs 1000
    python -m building_gan_tpu.cli.main sanity --epochs 5000
    python -m building_gan_tpu.cli.main test --log-dir runs/_base
"""

from __future__ import annotations

import argparse
import os


def _add_config_overrides(p: argparse.ArgumentParser) -> None:
    p.add_argument("--data-path", default=None, help="raw data root (DATA_PATH)")
    p.add_argument("--save-data-path", default=None, help="processed data dir (SAVE_DATA_PATH)")
    p.add_argument("--log-dir", default=None)
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--batch-size", type=int, default=None, help="graphs per step (BATCH_SIZE)")
    p.add_argument("--n-critic", type=int, default=None)
    p.add_argument("--conv-type", default=None, choices=["GCNCONV", "GRAPHCONV", "GATCONV", "GATV2CONV"])
    p.add_argument("--data-slicer", type=int, default=None)
    p.add_argument("--pack-graphs", type=int, default=None)
    p.add_argument("--pack-voxel-nodes", type=int, default=None)
    p.add_argument("--pack-voxel-edges", type=int, default=None)
    p.add_argument("--pack-local-nodes", type=int, default=None)
    p.add_argument("--pack-local-edges", type=int, default=None)
    p.add_argument("--mesh-data", type=int, default=None, help="data-parallel shards")
    p.add_argument("--layout", default=None, choices=["grid", "edges"], help="compute layout (LAYOUT)")
    p.add_argument("--generator-arch", default=None, choices=["hourglass", "transformer"], help="GENERATOR_ARCH")
    p.add_argument("--batch-level-matching", action="store_true", help="quirk Q1 parity")
    p.add_argument("--batch-level-graphnorm", action="store_true", help="quirk Q5 parity")
    p.add_argument("--use-pallas", action="store_true", help="fused Pallas inference path (USE_PALLAS)")
    p.add_argument("--compute-dtype", default=None, choices=["bfloat16", "float32"], help="COMPUTE_DTYPE")
    p.add_argument("--slot-graphs", type=int, default=None, help="buildings bin-packed per grid slot (GRID_SLOT_GRAPHS)")
    p.add_argument("--grid-local-nodes", type=int, default=None, help="packed local-node width per slot (GRID_LOCAL_NODES)")
    p.add_argument("--grid-buckets", default=None,
                   help="comma-separated FxYxX shapes, e.g. 6x6x6,11x12x12 — route each "
                        "building to its smallest fitting bucket (GRID_BUCKETS; composes "
                        "with --slot-graphs bin packing)")
    p.add_argument("--device-resident", action="store_true",
                   help="pack once + keep batches on device across epochs (DEVICE_RESIDENT_DATA)")
    p.add_argument("--device-resident-compositions", type=int, default=None,
                   help="with --device-resident: pre-pack N distinct batch "
                        "compositions and cycle one per epoch "
                        "(DEVICE_RESIDENT_COMPOSITIONS; 1 = frozen composition)")
    p.add_argument("--ckpt-latest-interval", type=int, default=None,
                   help="crash-recovery checkpoint every N epochs (CKPT_LATEST_INTERVAL; 0 = off)")
    p.add_argument("--pack-gemms", action="store_true",
                   help="fold narrow GEMMs into MXU lanes (PACK_NARROW_GEMMS, ops/gemm_pack.py)")
    p.add_argument("--hourglass-min-channels", type=int, default=None,
                   help="clamp the hourglass channel halving at this floor "
                        "(HOURGLASS_MIN_CHANNELS; 1 = reference schedule — "
                        "changes parameter shapes, re-validate quality)")
    p.add_argument("--platform", default=None, choices=["cpu", "tpu"],
                   help="force the jax backend BEFORE init (some hosts ignore "
                        "JAX_PLATFORMS via sitecustomize; jax.config is authoritative)")


def _build_config(args, sanity: bool = False):
    from ..config import Configuration

    cfg = Configuration(sanity_checking=sanity)
    mapping = {
        "data_path": "DATA_PATH",
        "save_data_path": "SAVE_DATA_PATH",
        "log_dir": "LOG_DIR",
        "epochs": "EPOCHS",
        "seed": "SEED",
        "batch_size": "BATCH_SIZE",
        "n_critic": "N_CRITIC",
        "data_slicer": "DATA_SLICER",
        "pack_graphs": "PACK_GRAPHS",
        "pack_voxel_nodes": "PACK_VOXEL_NODES",
        "pack_voxel_edges": "PACK_VOXEL_EDGES",
        "pack_local_nodes": "PACK_LOCAL_NODES",
        "pack_local_edges": "PACK_LOCAL_EDGES",
        "mesh_data": "MESH_DATA",
        "layout": "LAYOUT",
        "generator_arch": "GENERATOR_ARCH",
    }
    overrides = {}
    for arg_name, field in mapping.items():
        v = getattr(args, arg_name, None)
        if v is not None:
            overrides[field] = v
    if getattr(args, "conv_type", None):
        overrides["GENERATOR_CONV_TYPE"] = args.conv_type
        overrides["DISCRIMINATOR_CONV_TYPE"] = args.conv_type
    if getattr(args, "batch_level_matching", False):
        overrides["BATCH_LEVEL_MATCHING"] = True
    if getattr(args, "batch_level_graphnorm", False):
        overrides["BATCH_LEVEL_GRAPHNORM"] = True
    if getattr(args, "use_pallas", False):
        overrides["USE_PALLAS"] = True
    if getattr(args, "compute_dtype", None):
        overrides["COMPUTE_DTYPE"] = args.compute_dtype
    if getattr(args, "slot_graphs", None) is not None:
        overrides["GRID_SLOT_GRAPHS"] = args.slot_graphs
    if getattr(args, "grid_local_nodes", None) is not None:
        overrides["GRID_LOCAL_NODES"] = args.grid_local_nodes
    if getattr(args, "grid_buckets", None):
        overrides["GRID_BUCKETS"] = tuple(
            tuple(int(d) for d in shape.split("x"))
            for shape in args.grid_buckets.split(",")
        )
    if getattr(args, "device_resident", False):
        overrides["DEVICE_RESIDENT_DATA"] = True
    if getattr(args, "device_resident_compositions", None) is not None:
        overrides["DEVICE_RESIDENT_COMPOSITIONS"] = args.device_resident_compositions
    if getattr(args, "ckpt_latest_interval", None) is not None:
        overrides["CKPT_LATEST_INTERVAL"] = args.ckpt_latest_interval
    if getattr(args, "pack_gemms", False):
        overrides["PACK_NARROW_GEMMS"] = True
    if getattr(args, "hourglass_min_channels", None) is not None:
        overrides["HOURGLASS_MIN_CHANNELS"] = args.hourglass_min_channels
    return cfg.replace(**overrides) if overrides else cfg


def cmd_synth(args):
    from ..data.synthetic import write_dataset

    root = args.data_path or _build_config(args).DATA_PATH
    write_dataset(root, args.num, seed=args.seed or 0)
    print(f"wrote {args.num} synthetic buildings under {root}")


def cmd_preprocess(args):
    from ..data.preprocess import create_dataset

    cfg = _build_config(args)
    import time

    t0 = time.time()
    n = create_dataset(cfg, workers=getattr(args, "workers", 0))
    dt = time.time() - t0
    print(f"processed {n} buildings in {dt:.1f}s ({n / max(dt, 1e-9):.2f} it/s)")


def cmd_ingest(args):
    """Convert the reference's processed ``.pt`` dataset into our NPZ layout
    (reference `data.py:457-461` torch.save pairs -> GraphDataset-loadable)."""
    from ..data.ingest import convert_reference_processed

    n = convert_reference_processed(args.src, args.dst, compress=args.compress)
    print(f"converted {n} buildings: {args.src} -> {args.dst}")


def cmd_analyze(args):
    from ..utils.analyze import analyze_dataset

    cfg = _build_config(args)
    analyze_dataset(cfg)


def _make_trainer(args, sanity: bool):
    import jax

    from ..data.pipeline import GraphDataLoaders
    from ..models import (
        GridVoxelGNNDiscriminator,
        GridVoxelGNNGenerator,
        VoxelGNNDiscriminator,
        VoxelGNNGenerator,
    )
    from ..parallel import mesh as meshlib
    from ..train.trainer import Trainer

    cfg = _build_config(args, sanity=sanity)
    mesh = None
    n_dev = cfg.MESH_DATA
    if n_dev > 1:
        mesh = meshlib.make_mesh(n_dev)
    loaders = GraphDataLoaders(cfg, n_device_batches=None if mesh is None else n_dev)
    if cfg.LAYOUT == "grid":
        if cfg.GENERATOR_ARCH == "transformer":
            from ..models import GridTransformerGenerator

            gen = GridTransformerGenerator(configuration=cfg)
        else:
            gen = GridVoxelGNNGenerator(configuration=cfg)
        disc = GridVoxelGNNDiscriminator(configuration=cfg)
    else:
        gen = VoxelGNNGenerator(configuration=cfg)
        disc = VoxelGNNDiscriminator(configuration=cfg)
    log_dir = args.log_dir
    return Trainer(gen, disc, loaders, cfg, log_dir=log_dir, mesh=mesh)


def cmd_train(args):
    trainer = _make_trainer(args, sanity=False)
    trainer.train()


def cmd_sanity(args):
    trainer = _make_trainer(args, sanity=True)
    trainer.train()


def cmd_viz(args):
    from ..viz.raw import render_raw_samples

    cfg = _build_config(args)
    paths = render_raw_samples(cfg, list(range(args.num)), args.out_dir)
    print("\n".join(paths))


def cmd_test(args):
    trainer = _make_trainer(args, sanity=False)
    trainer.test(num_samples_to_viz=args.num_samples_to_viz, show=args.show)


def main(argv=None):
    parser = argparse.ArgumentParser(prog="building_gan_tpu")
    sub = parser.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("synth", help="generate a synthetic raw dataset")
    p.add_argument("--num", type=int, default=100)
    _add_config_overrides(p)
    p.set_defaults(fn=cmd_synth)

    p = sub.add_parser("preprocess", help="raw JSON -> NPZ pairs")
    p.add_argument("--workers", type=int, default=0, help="host-parallel worker processes")
    _add_config_overrides(p)
    p.set_defaults(fn=cmd_preprocess)

    p = sub.add_parser("ingest", help="reference processed .pt pairs -> NPZ dataset")
    p.add_argument("--src", required=True, help="directory of {num}_local.pt/{num}_voxel.pt")
    p.add_argument("--dst", required=True, help="output directory for NPZ pairs")
    p.add_argument("--compress", action="store_true")
    p.set_defaults(fn=cmd_ingest)

    p = sub.add_parser("analyze", help="dataset statistics + FAR invariant check")
    _add_config_overrides(p)
    p.set_defaults(fn=cmd_analyze)

    p = sub.add_parser("train", help="full training run")
    _add_config_overrides(p)
    p.set_defaults(fn=cmd_train)

    p = sub.add_parser("sanity", help="single-datum overfit harness")
    _add_config_overrides(p)
    p.set_defaults(fn=cmd_sanity)

    p = sub.add_parser("viz", help="render raw buildings from JSON (data-visualization notebook)")
    p.add_argument("--num", type=int, default=6)
    p.add_argument("--out-dir", default="viz_out")
    _add_config_overrides(p)
    p.set_defaults(fn=cmd_viz)

    p = sub.add_parser("test", help="test-split metrics + qualitative eval")
    p.add_argument("--num-samples-to-viz", type=int, default=10)
    p.add_argument("--show", action="store_true")
    _add_config_overrides(p)
    p.set_defaults(fn=cmd_test)

    args = parser.parse_args(argv)
    if getattr(args, "platform", None):
        # Must precede any jax backend init (all command bodies import jax
        # lazily).  The env-var route is NOT equivalent on hosts whose
        # sitecustomize pins jax_platforms (docs/DESIGN.md round-4 notes).
        import jax

        jax.config.update("jax_platforms", args.platform)
    args.fn(args)


if __name__ == "__main__":
    main()
