"""Measure the REFERENCE implementation's training throughput on this host.

VERDICT r3 "missing #3": `bench.py`'s `vs_baseline` divided by an analytic
estimate; torch 2.13 (CPU) is importable here and the reference source is
mounted, so the reference per-batch training work can be *measured*.

What runs: the reference's own `Trainer._train_each_epoch`
(`/root/reference/building_gan/src/trainer.py:445-507`) — the real loop body,
byte-for-byte: N_CRITIC=5 critic updates (each = no-grad G forward + 2 critic
forwards + GP interpolate forward + double-backward) + 1 generator update +
sklearn metrics — on the real reference `VoxelGNNGenerator`/`Discriminator`
(`models.py`), imported as-is.  Its torch_geometric layers are satisfied by
the same documented-semantics stubs the golden model-parity test uses
(`tests/test_reference_model_parity.py`: scatter-based GATConv softmax
aggregation, GraphNorm, Sequential) — the same index_add/scatter op class
PyG lowers to, so the CPU cost class is representative.  Data: merged
PyG-style batches built from this repo's preprocessed voxel/local graphs
(array-exact parity with the reference preprocessing is golden-tested).

Accounting matches `bench.py`: nodes/s = merged REAL voxel nodes in the batch
/ wall time for the full WGAN-GP step over that batch.

Usage:
    python scripts/bench_reference.py [--graphs 512] [--batches 2] [--data /tmp/bgt_demo/processed]

Output: one JSON line with measured reference nodes/s on this CPU, plus the
per-batch times.  Pair with `JAX_PLATFORMS=cpu python bench.py` for the
like-for-like CPU ratio (see BASELINE.md / docs/PERF.md §13).
"""

from __future__ import annotations

import argparse
import datetime
import glob
import json
import os
import sys
import time
import types

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
REFERENCE_ROOT = "/root/reference"
sys.path.insert(0, os.path.join(REPO, "tests"))
sys.path.insert(0, REPO)


def _stub_modules():
    """Satisfy the reference trainer's imports that are absent here.

    pytz (timestamp-only use), torch_geometric.data.Batch (type annotation
    only on this path), IPython/tqdm pass-throughs.  The PyG *layers* come
    from tests/test_reference_model_parity.py's documented-semantics stubs.
    """
    import importlib.machinery

    def _mod(name):
        m = types.ModuleType(name)
        # torch._dynamo scans sys.modules and requires a real __spec__
        m.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
        return m

    if "pytz" not in sys.modules:
        pytz = _mod("pytz")
        pytz.timezone = lambda name: datetime.timezone.utc
        sys.modules["pytz"] = pytz
    if "tqdm" not in sys.modules:
        tq = _mod("tqdm")
        tq.tqdm = lambda x, *a, **k: x
        sys.modules["tqdm"] = tq
    # PyG layer stubs (GATConv/GraphNorm/Sequential) + data.Batch
    import test_reference_model_parity as stubs

    tg = sys.modules.get("torch_geometric") or _mod("torch_geometric")
    tgnn = _mod("torch_geometric.nn")
    tgnn.GATConv = stubs.StubGATConv
    tgnn.GCNConv = None
    tgnn.GraphConv = None
    tgnn.GATv2Conv = None
    tgnn.Sequential = stubs.StubSequential
    norm = _mod("torch_geometric.nn.norm")
    norm.GraphNorm = stubs.StubGraphNorm
    tgnn.norm = norm
    tgd = _mod("torch_geometric.data")
    tgd.Data = tgd.Dataset = tgd.Batch = object
    tg.nn = tgnn
    tg.data = tgd
    sys.modules["torch_geometric"] = tg
    sys.modules["torch_geometric.nn"] = tgnn
    sys.modules["torch_geometric.nn.norm"] = norm
    sys.modules["torch_geometric.data"] = tgd
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)


class _GraphView:
    """Per-graph view: what `voxel_graph[gi]` must expose (trainer.py:366-380,
    425-441): .x, .num_nodes, .type, .site_area (1-elem tensor)."""

    def __init__(self, x, type_, site_area):
        self.x = x
        self.type = type_
        self.num_nodes = x.shape[0]
        self.site_area = site_area


class FakeBatch:
    """PyG-Batch protocol subset used by `_train_each_epoch` + its callees:
    concatenated .x/.type/.types_onehot, offset .edge_index, .num_nodes,
    .num_graphs, indexing, .data_number (list of id strings), .to(device)."""

    def __init__(self, graphs):
        import torch

        self._views = []
        xs, types_, onehots, edges = [], [], [], []
        self.data_number = []
        off = 0
        for g in graphs:
            x = torch.from_numpy(g["x"]).float()
            t = torch.from_numpy(g["types"]).long()
            xs.append(x)
            types_.append(t)
            if "types_onehot" in g:
                onehots.append(torch.from_numpy(g["types_onehot"]).float())
            edges.append(torch.from_numpy(g["edge_index"]).long() + off)
            site = torch.tensor([float(g["site_area"])])
            self._views.append(_GraphView(x, t, site))
            self.data_number.append(str(g["data_number"]))
            off += x.shape[0]
        self.x = torch.cat(xs)
        self.type = torch.cat(types_)
        if onehots:
            self.types_onehot = torch.cat(onehots)
        self.edge_index = torch.cat(edges, dim=1)
        self.num_nodes = self.x.shape[0]
        self.num_graphs = len(graphs)

    def __getitem__(self, gi):
        return self._views[gi]

    def to(self, device):
        return self


def load_pairs(data_dir, n):
    import numpy as np

    vfiles = sorted(glob.glob(os.path.join(data_dir, "*_voxel.npz")))[:n]
    if len(vfiles) < n:
        raise SystemExit(
            f"need {n} preprocessed buildings under {data_dir} "
            f"(found {len(vfiles)}); generate with scripts/demo_train.py or "
            f"`python -m building_gan_tpu.cli.main synth/preprocess`"
        )
    pairs = []
    for vf in vfiles:
        lf = vf.replace("_voxel.npz", "_local.npz")
        pairs.append((dict(np.load(lf)), dict(np.load(vf))))
    return pairs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--graphs", type=int, default=512,
                    help="buildings per batch (reference BATCH_SIZE=512)")
    ap.add_argument("--batches", type=int, default=2, help="timed batches")
    ap.add_argument("--n-critic", type=int, default=None,
                    help="override N_CRITIC (default: reference 5)")
    ap.add_argument("--data", default="/tmp/bgt_demo/processed")
    args = ap.parse_args()

    _stub_modules()
    import torch

    from building_gan.src.config import Configuration as RefConfiguration
    from building_gan.src.models import VoxelGNNDiscriminator, VoxelGNNGenerator
    from building_gan.src.trainer import Trainer

    cfg = RefConfiguration()
    cfg.DEVICE = "cpu"
    if args.n_critic is not None:
        cfg.N_CRITIC = args.n_critic

    pairs = load_pairs(args.data, args.graphs * args.batches)
    local_dim = pairs[0][0]["x"].shape[1]
    voxel_dim = pairs[0][1]["x"].shape[1]

    torch.manual_seed(cfg.SEED)
    generator = VoxelGNNGenerator(cfg, local_dim, voxel_dim)
    discriminator = VoxelGNNDiscriminator(cfg, local_dim, voxel_dim)

    # Trainer without its __init__ (which builds SummaryWriter/log dirs):
    # set exactly the attributes `_train_each_epoch` reads.
    trainer = object.__new__(Trainer)
    trainer.configuration = cfg
    trainer.generator = generator
    trainer.discriminator = discriminator
    trainer.optimizer_generator = torch.optim.Adam(
        generator.parameters(), lr=cfg.LEARNING_RATE_GENERATOR, betas=cfg.BETAS
    )
    trainer.optimizer_discriminator = torch.optim.Adam(
        discriminator.parameters(), lr=cfg.LEARNING_RATE_DISCRIMINATOR, betas=cfg.BETAS
    )

    batches = []
    for b in range(args.batches):
        chunk = pairs[b * args.graphs:(b + 1) * args.graphs]
        batches.append((FakeBatch([lg for lg, _ in chunk]), FakeBatch([vg for _, vg in chunk])))

    # warmup: one reduced batch to touch every code path / allocator pool
    warm = min(8, args.graphs)
    trainer.dataloaders = types.SimpleNamespace(
        train_dataloader=[(FakeBatch([lg for lg, _ in pairs[:warm]]),
                           FakeBatch([vg for _, vg in pairs[:warm]]))]
    )
    trainer._train_each_epoch()

    per_batch_s, per_batch_nodes = [], []
    for lb, vb in batches:
        trainer.dataloaders = types.SimpleNamespace(train_dataloader=[(lb, vb)])
        t0 = time.perf_counter()
        trainer._train_each_epoch()
        dt = time.perf_counter() - t0
        per_batch_s.append(dt)
        per_batch_nodes.append(vb.num_nodes)
        print(f"# batch: {vb.num_graphs} graphs, {vb.num_nodes} voxel nodes, "
              f"{dt:.2f}s -> {vb.num_nodes / dt:,.0f} nodes/s", file=sys.stderr)

    total_nodes = sum(per_batch_nodes)
    total_s = sum(per_batch_s)
    print(json.dumps({
        "metric": "reference_train_voxel_nodes_per_sec_cpu",
        "value": round(total_nodes / total_s, 1),
        "unit": "nodes/sec",
        "detail": {
            "what": "reference Trainer._train_each_epoch (trainer.py:445-507), "
                    "real models.py under documented-semantics PyG stubs",
            "graphs_per_batch": args.graphs,
            "batches": args.batches,
            "n_critic": cfg.N_CRITIC,
            "nodes_per_batch": per_batch_nodes,
            "batch_seconds": [round(s, 2) for s in per_batch_s],
            "torch_version": torch.__version__,
            "torch_threads": torch.get_num_threads(),
            "cpus": os.cpu_count(),
        },
    }))


if __name__ == "__main__":
    main()
