"""Golden MODEL parity: run the ACTUAL reference generator with converted
weights and diff logits (VERDICT r1 missing #1, second half).

`/root/reference/building_gan/src/models.py` VoxelGNNGenerator is imported
as-is; its torch_geometric dependencies (GATConv, GraphNorm, Sequential) are
satisfied by minimal torch implementations of the documented PyG semantics
written here — an INDEPENDENT third implementation, so agreement between
(a) the reference wiring + torch stub math with (b) this framework's flax
model under (c) `checkpoint/torch_compat`-converted weights checks all
three: feature plumbing, conv/norm semantics, and the weight converter
(loaded with ``strict=True`` against the real module tree).

Quirk flags: the reference calls GraphNorm without a batch vector (Q5
batch-level stats) — mirrored via BATCH_LEVEL_GRAPHNORM=True.
"""

import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

from test_reference_parity import REFERENCE_ROOT, reference_modules, triplets  # noqa: F401


# ---------------------------------------------------------------------------
# minimal PyG stubs (documented semantics, independent implementation)
# ---------------------------------------------------------------------------


class StubGATConv(tnn.Module):
    """PyG GATConv defaults: heads=1, add_self_loops=True, bias=True."""

    def __init__(self, in_channels, out_channels):
        super().__init__()
        self.lin = tnn.Linear(in_channels, out_channels, bias=False)
        self.att_src = tnn.Parameter(torch.empty(1, 1, out_channels))
        self.att_dst = tnn.Parameter(torch.empty(1, 1, out_channels))
        self.bias = tnn.Parameter(torch.zeros(out_channels))
        tnn.init.xavier_uniform_(self.att_src)
        tnn.init.xavier_uniform_(self.att_dst)

    def forward(self, x, edge_index):
        n = x.shape[0]
        h = self.lin(x)  # (N, C)
        a_src = (h * self.att_src[0, 0]).sum(-1)  # (N,)
        a_dst = (h * self.att_dst[0, 0]).sum(-1)
        # add self loops
        loops = torch.arange(n, device=x.device)
        src = torch.cat([edge_index[0], loops])
        dst = torch.cat([edge_index[1], loops])
        e = torch.nn.functional.leaky_relu(a_src[src] + a_dst[dst], 0.2)
        # softmax over incoming edges per target
        m = torch.full((n,), -1e30, device=x.device)
        m = m.index_reduce(0, dst, e, "amax", include_self=True)
        exp_e = torch.exp(e - m[dst])
        denom = torch.zeros(n, device=x.device).index_add(0, dst, exp_e)
        alpha = exp_e / denom[dst]
        out = torch.zeros_like(h).index_add(0, dst, alpha[:, None] * h[src])
        return out + self.bias


class StubGraphNorm(tnn.Module):
    """PyG GraphNorm called WITHOUT a batch vector: whole-tensor statistics,
    learned mean scale: (x - mean*ms) / std * weight + bias."""

    def __init__(self, channels, eps: float = 1e-5):
        super().__init__()
        self.weight = tnn.Parameter(torch.ones(channels))
        self.bias = tnn.Parameter(torch.zeros(channels))
        self.mean_scale = tnn.Parameter(torch.ones(channels))
        self.eps = eps

    def forward(self, x):
        mean = x.mean(dim=0, keepdim=True)
        out = x - mean * self.mean_scale
        var = (out * out).mean(dim=0, keepdim=True)
        return self.weight * out / torch.sqrt(var + self.eps) + self.bias


class StubSequential(tnn.Module):
    """tgnn.Sequential(input_args, modules): threads x through, passing
    edge_index to the (module, "x, edge_index -> x") entries."""

    def __init__(self, input_args=None, modules=None):
        super().__init__()
        self._specs = []
        for i, m in enumerate(modules):
            mod, needs_edges = (m[0], True) if isinstance(m, tuple) else (m, False)
            self.add_module(f"module_{i}", mod)
            self._specs.append(needs_edges)

    def forward(self, x=None, edge_index=None):
        for i, needs_edges in enumerate(self._specs):
            mod = getattr(self, f"module_{i}")
            x = mod(x, edge_index) if needs_edges else mod(x)
        return x


@pytest.fixture(scope="module")
def reference_generator_cls(reference_modules):  # noqa: F811
    """Import the real reference models.py against the PyG stubs."""
    tg = sys.modules.get("torch_geometric") or types.ModuleType("torch_geometric")
    tgnn_mod = types.ModuleType("torch_geometric.nn")
    tgnn_mod.GATConv = StubGATConv
    tgnn_mod.GCNConv = None
    tgnn_mod.GraphConv = None
    tgnn_mod.GATv2Conv = None
    tgnn_mod.Sequential = StubSequential
    norm_mod = types.ModuleType("torch_geometric.nn.norm")
    norm_mod.GraphNorm = StubGraphNorm
    tgnn_mod.norm = norm_mod
    tg.nn = tgnn_mod
    sys.modules["torch_geometric"] = tg
    sys.modules["torch_geometric.nn"] = tgnn_mod
    sys.modules["torch_geometric.nn.norm"] = norm_mod

    sys.modules.pop("building_gan.src.models", None)
    from building_gan.src.models import VoxelGNNGenerator as RefGen

    return RefGen


def test_reference_generator_forward_matches(
    reference_generator_cls, reference_modules, triplets, small_cfg  # noqa: F811
):
    """Converted weights + real reference model == our edge-path generator."""
    import jax
    import jax.numpy as jnp

    from building_gan_tpu.checkpoint import torch_compat
    from building_gan_tpu.config import Configuration
    from building_gan_tpu.data import batching, preprocess
    from building_gan_tpu.models import VoxelGNNGenerator

    RefConfiguration, _ = reference_modules
    ref_cfg = RefConfiguration()

    # full-size config (field parity with the reference hyperparameters);
    # Q5 ON: the reference invokes GraphNorm without a batch vector
    cfg = Configuration(
        LAYOUT="edges", BATCH_LEVEL_GRAPHNORM=True,
        PACK_GRAPHS=1, PACK_LOCAL_NODES=256, PACK_LOCAL_EDGES=2048,
        PACK_VOXEL_NODES=2048, PACK_VOXEL_EDGES=16384,
    )
    assert cfg.GENERATOR_CONV_TYPE == "GATCONV"

    g, l, v = triplets[0]
    local, voxel = preprocess.process_building(g, l, v, cfg, "000000")
    packed = batching.pack_one([(local, voxel)], cfg)

    gen = VoxelGNNGenerator(configuration=cfg, dtype=jnp.float32)
    key = jax.random.key(0)
    z_np = np.random.default_rng(7).normal(size=(voxel.x.shape[0], cfg.Z_DIM)).astype(np.float32)
    nv = packed.voxel_x.shape[0]
    z_packed = np.zeros((nv, cfg.Z_DIM), np.float32)
    z_packed[: voxel.x.shape[0]] = z_np
    variables = gen.init(
        {"params": key, "gumbel": key}, packed, jnp.array(z_packed), deterministic=True
    )
    logits_ours, _, _ = gen.apply(
        variables, packed, jnp.array(z_packed), deterministic=True, rngs={"gumbel": key}
    )
    logits_ours = np.array(logits_ours[: voxel.x.shape[0]])

    # convert weights and load into the REAL reference module tree, strict
    state_np = torch_compat.generator_params_to_torch(
        jax.device_get(variables["params"]), cfg
    )
    ref_gen = reference_generator_cls(
        ref_cfg, local_graph_dim=local.x.shape[1], voxel_graph_dim=voxel.x.shape[1]
    )
    state_t = {k: torch.from_numpy(np.ascontiguousarray(a)) for k, a in state_np.items()}
    missing, unexpected = ref_gen.load_state_dict(state_t, strict=True), None
    ref_gen.eval()

    class _G:  # the Data attributes the forward touches
        pass

    lg = _G()
    lg.x = torch.from_numpy(local.x)
    lg.type = torch.from_numpy(local.types.astype(np.int64))
    lg.edge_index = torch.from_numpy(local.edge_index.astype(np.int64))
    vg = _G()
    vg.x = torch.from_numpy(voxel.x)
    vg.type = torch.from_numpy(voxel.types.astype(np.int64))
    vg.edge_index = torch.from_numpy(voxel.edge_index.astype(np.int64))

    with torch.no_grad():
        logits_ref, _, _ = ref_gen(lg, vg, torch.from_numpy(z_np))
    logits_ref = logits_ref.numpy()

    np.testing.assert_allclose(logits_ours, logits_ref, rtol=5e-3, atol=1e-3)
