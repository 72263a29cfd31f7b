"""Configuration for the TPU-native Building-GAN framework.

Mirrors the hyperparameter surface of the reference implementation
(`building_gan/src/config.py:9-157`) — same field names, same defaults — while
adding the TPU-specific knobs the reference has no counterpart for (static-shape
packing budgets, mesh layout, dtype policy, quirk parity flags).

The reference exposes configuration as a class-attribute mixin
(ProgramMap + DataConfiguration + ModelConfiguration -> Configuration).  Here it
is a single flat dataclass: explicit, hashable where needed, serializable via
``to_dict`` for experiment logging (reference `config.py:119-135`).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Dict, Tuple


# ---------------------------------------------------------------------------
# Program map (reference config.py:9-30)
# ---------------------------------------------------------------------------

VOID_OLD = -1  # legacy label remapped to VOID during preprocessing

LOBBY_CORRIDOR = 0
RESTROOM = 1
STAIRS = 2
ELEVATOR = 3
OFFICE = 4
MECHANICAL_ROOM = 5
VOID = 6

COLORS: Dict[int, str] = {
    LOBBY_CORRIDOR: "brown",
    RESTROOM: "red",
    STAIRS: "yellow",
    ELEVATOR: "green",
    OFFICE: "blue",
    MECHANICAL_ROOM: "orange",
    VOID: "gray",
}

PROGRAM_NAMES: Dict[int, str] = {
    LOBBY_CORRIDOR: "LOBBY_CORRIDOR",
    RESTROOM: "RESTROOM",
    STAIRS: "STAIRS",
    ELEVATOR: "ELEVATOR",
    OFFICE: "OFFICE",
    MECHANICAL_ROOM: "MECHANICAL_ROOM",
    VOID: "VOID",
}

NUM_CLASSES = len(COLORS)  # 7


def _default_data_root() -> str:
    return os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "data"))


@dataclasses.dataclass
class Configuration:
    """All knobs for data, model, and training.

    Field names follow the reference (`config.py`) so that a user of the
    reference can map their run configuration 1:1.
    """

    # --- ProgramMap (reference config.py:9-30) ---
    NUM_CLASSES: int = NUM_CLASSES
    VOID: int = VOID
    VOID_OLD: int = VOID_OLD

    # --- DataConfiguration (reference config.py:33-48) ---
    DATA_PATH: str = dataclasses.field(
        default_factory=lambda: os.path.join(_default_data_root(), "6types-raw_data")
    )
    SAVE_DATA_PATH: str = dataclasses.field(
        default_factory=lambda: os.path.join(_default_data_root(), "6types-processed_data")
    )
    NORMALIZATION_FACTOR_FLOOR_LEVEL: float = 10.0
    NORMALIZATION_FACTOR_DIMENSION: float = 11.0
    NORMALIZATION_FACTOR_LOCATION: float = 11.0
    NORMALIZATION_FACTOR_COORDINATE: float = 42.0
    NORMALIZATION_FACTOR_SITE: float = 1600.0
    LOCAL_DATA_SUFFIX: str = "_local.npz"
    VOXEL_DATA_SUFFIX: str = "_voxel.npz"

    # --- ModelConfiguration (reference config.py:51-106) ---
    EPOCHS: int = 5000
    SEED: int = 777

    TRAIN_SPLIT_RATIO: float = 0.65
    VALIDATION_SPLIT_RATIO: float = 0.25
    TEST_SPLIT_RATIO: float = 0.10

    DATA_POINT: int | None = None
    DATA_SLICER: int = int(1e10)
    BATCH_SIZE: int = 512  # graphs per global step

    N_CRITIC: int = 5
    LEARNING_RATE_GENERATOR: float = 2e-4
    LEARNING_RATE_DISCRIMINATOR: float = 2e-4

    LAMBDA_RATIO: float = 0.1
    LAMBDA_RATIO_VOID: float = 0.1
    LAMBDA_LABEL: float = 0.0
    LAMBDA_ADV: float = 1.0
    LAMBDA_FAR: float = 0.1
    LAMBDA_GP: float = 10.0

    BETAS: Tuple[float, float] = (0.5, 0.999)

    F1_SCORE_TRAIN_WEIGHT: float = 0.05
    F1_SCORE_VALIDATION_WEIGHT: float = 1.0

    METRICS_AVERAGE: str = "macro"

    LOG_DIR: str = dataclasses.field(
        default_factory=lambda: os.path.abspath(
            os.path.join(os.path.dirname(__file__), "..", "runs")
        )
    )

    GENERATOR_CONV_TYPE: str = "GATCONV"
    GENERATOR_ENCODER_REPEAT: int = 7
    GENERATOR_HIDDEN_DIM: int = 128
    # generator architecture: "hourglass" (reference GNN) or "transformer"
    # (stretch config #5: global attention over a building's voxel cells)
    GENERATOR_ARCH: str = "hourglass"
    TRANSFORMER_LAYERS: int = 4
    TRANSFORMER_HEADS: int = 4

    DISCRIMINATOR_CONV_TYPE: str = "GATCONV"
    DISCRIMINATOR_ENCODER_REPEAT: int = 3
    DISCRIMINATOR_HIDDEN_DIM: int = 64

    Z_DIM: int = 128
    LOCAL_GRAPH_ENCODER_REPEAT: int = 4
    LOCAL_ENCODER_HIDDEN_DIM: int = 128
    ENCODER_DROPOUT_RATE: float = 0.2

    GENERATOR_MLP_ENCODER_REPEAT: int = 4

    USE_WGANGP: bool = True

    SANITY_CHECKING: bool = False
    # reference ctor compatibility: Configuration(sanity_checking=True)
    sanity_checking: dataclasses.InitVar[bool] = False

    # --- TPU-native additions (no reference counterpart) ---
    # Static-shape packing budgets: each packed batch element holds up to
    # PACK_GRAPHS graphs, PACK_LOCAL_NODES / PACK_VOXEL_NODES nodes, and the
    # corresponding edge budgets, padded to exactly these sizes so every jitted
    # step sees one shape.  Defaults sized from the reference dataset stats
    # (avg ~399 voxels/building, `analyze.py:100-110`).
    PACK_GRAPHS: int = 64
    PACK_LOCAL_NODES: int = 2048
    PACK_LOCAL_EDGES: int = 8192
    PACK_VOXEL_NODES: int = 32768
    PACK_VOXEL_EDGES: int = 262144

    # Dense-grid layout (the TPU fast path, see data/grid.py + ops/stencil.py):
    # voxel graphs are irregular grids (location = (floor, iy, ix)); the
    # reference dataset spans floors 0-10 and locations 0-11 (analyze.py:99-110)
    # so (11, 12, 12) covers every building.  GRID_BATCH buildings per step.
    GRID_SHAPE: Tuple[int, int, int] = (11, 12, 12)
    GRID_BATCH: int = 64
    GRID_LOCAL_NODES: int = 64
    # Max buildings 3D-bin-packed into one grid slot (per-cell graph-id
    # planes — data/grid.py pack_grid_multi).  1 = one building per slot
    # (pack_grid).  Raising this cuts padding waste: real buildings fill
    # ~25% of an (11,12,12) slot alone.
    GRID_SLOT_GRAPHS: int = 1
    # Multipack placement granularity: "cell" places buildings gap-free on
    # their actual cells (fill ~79% on reference-statistics batches; safe
    # because stencils are gid-aware — ops/stencil.py), "bbox_gap" reserves
    # each bounding box plus a 1-cell margin (fill ~63%; never face-adjacent,
    # stencil isolation holds even without gid planes).
    GRID_PACK_MODE: str = "cell"
    # Optional bucketing: route each building to the smallest fitting grid
    # shape to cut padding waste (one compiled program per bucket).  None =
    # single GRID_SHAPE bucket.  Example: ((6, 6, 6), (8, 8, 8), (11, 12, 12)).
    GRID_BUCKETS: Tuple[Tuple[int, int, int], ...] | None = None
    # layout: "grid" (dense stencil fast path) or "edges" (general fallback)
    LAYOUT: str = "grid"
    # Pack the dataset once and keep every batch device-resident: epochs
    # reshuffle only the BATCH ORDER (composition is frozen after epoch 1)
    # and no host->device transfer happens after warmup.  Two reasons to
    # turn this on for long runs: (a) per-step transfer time disappears,
    # (b) the tunneled PJRT client on this host leaks host RAM roughly
    # 1:1 with bytes transferred (reproduced with a bare device_put loop;
    # TRAINING.md "ref10k OOM post-mortem"), which OOM-kills multi-hundred-
    # epoch runs at reference scale.  Costs device HBM (~25 MB per packed
    # 512-building batch) and the per-epoch composition reshuffle.
    DEVICE_RESIDENT_DATA: bool = False
    # With DEVICE_RESIDENT_DATA: number of distinct batch COMPOSITIONS to
    # pre-pack and keep on device, cycled one per epoch.  1 = the round-4
    # behavior (composition frozen after epoch 1 — the reference reshuffles
    # composition per epoch, `building_gan/src/data.py:177-210`); P > 1
    # restores composition variety with period P at zero steady-state
    # transfers, costing P x the dataset's device HBM (~450 MB per
    # composition at ref10k scale on a 16 GB chip).  Batch ORDER still
    # reshuffles every epoch in either case.
    DEVICE_RESIDENT_COMPOSITIONS: int = 1
    # Periodic crash-recovery checkpoint every N epochs (states_latest.*),
    # in addition to the reference's best-F1-gated save.  0 = off (the
    # reference-parity default).  On resume the trainer prefers whichever
    # checkpoint's epoch cursor is further along — a crash between best
    # updates then costs at most N epochs instead of everything since the
    # last best (TRAINING.md "ref10k OOM post-mortem").
    CKPT_LATEST_INTERVAL: int = 0

    # dtype policy: parameters/optimizer in f32, activations bf16 on the MXU.
    COMPUTE_DTYPE: str = "bfloat16"
    PARAM_DTYPE: str = "float32"

    # PRNG implementation (utils/prng.py): "auto" = threefry2x32 for training
    # (the hardware rbg impl collapses 700-epoch WGAN-GP runs — docs/PERF.md
    # §11), rbg on TPU for inference surfaces (+11% step, §9); or an explicit
    # jax impl name; or "rbg_full" = threefry key derivation with bulk bits
    # from the TPU hardware generator under full-entropy 128-bit keys
    # (ops/rng.py::bulk_key) — the throughput of rbg without its structured
    # [a,b,a,b] keys (§12).
    PRNG_IMPL: str = "auto"

    # Mesh: number of data-parallel shards (1 = single chip).
    MESH_DATA: int = 1

    # Quirk parity flags (SURVEY.md §7).
    # Q1: reference pools matched features across the WHOLE merged batch rather
    # than per graph.  False = fixed per-graph segment_mean (recommended);
    # True = reproduce reference batch-level pooling for parity runs.
    BATCH_LEVEL_MATCHING: bool = False
    # Q5: reference GraphNorm normalizes across the merged batch (no batch
    # vector).  False = per-graph GraphNorm (recommended); True = batch-level.
    BATCH_LEVEL_GRAPHNORM: bool = False
    # Reserve: opt into the fused Pallas hourglass for deterministic grid
    # inference (ops/pallas/hourglass.py).  Off by default — the XLA grid path
    # is already fast and the fused kernel's full-size compile is impractical
    # through this environment's remote-compile tunnel (docs/PALLAS.md).
    USE_PALLAS: bool = False
    # Fused custom-VJP Pallas hourglass in the TRAINING step (grid layout,
    # GATCONV): one kernel per layer each way instead of ~10 XLA fusion
    # passes.  Real/fake critic passes and all generator passes run fused;
    # the GP critic pass stays XLA (custom_vjp is first-order).  Measured
    # SLOWER than the XLA path at reference scale (recompute is VPU-bound:
    # 339 ms/hourglass traversal vs ~150 ms for XLA's entire G grad —
    # docs/PALLAS.md "Round-3 outcome"), so OFF by default; kept for larger
    # channel counts where the MXU/VPU balance shifts.  ops/pallas/gat_train.py.
    USE_PALLAS_TRAIN: bool = False
    PALLAS_TRAIN_TILE: int = 1

    # Unroll the N_CRITIC discriminator loop inside the jitted train step
    # (identical math — same fold_in key per iteration).  Hypothesis was that
    # the while op's loop-carried opt-state copies (~12% of the step as
    # copy-done/async-done, docs/PERF.md §6) would vanish; MEASURED SLOWER on
    # v5e-1 at reference scale: 178 -> 197 ms/step (docs/PERF.md §7) — the
    # unrolled program holds more live buffers and schedules worse.  Kept as
    # a knob for other scales; OFF by default.  Re-measured round 5 at the
    # 161 ms step, where copy-done had grown to ~18%: still -30% (230.6 ms,
    # docs/PERF.md §14.4) — the rolled loop's copies are the price of its
    # good schedule, not recoverable waste.
    UNROLL_CRITIC: bool = False

    # Rematerialize the hourglass stacks in the backward passes: wrap each
    # GridHourglass in jax.checkpoint(policy=dots_saveable) so only the GEMM
    # outputs are stored as residuals — GraphNorm statistics, attention
    # softmax planes, ReLU/dropout intermediates are recomputed instead of
    # being written to and re-read from HBM by the three differentiated
    # passes (G bwd, critic bwd, GP double-bwd).  A/B knob for the
    # bandwidth-bound train step (docs/PERF.md §10).
    REMAT_HOURGLASS: bool = False

    # Fold rows into MXU lanes for narrow GEMMs (ops/gemm_pack.py): the
    # hourglass tail (channels <=64, down to 1 at the bottleneck) and the
    # decoder MLPs under-fill 128x128 MXU tiles — the round-4 re-profile
    # measured the step's GEMMs at 7.5x their MXU floor (docs/PERF.md
    # §13.3 item "convolution fusion").  Packing applies kron(I_k, W)
    # block-diagonal weights over view-reshaped (M/k, k*c) activations —
    # identical math (off-diagonal blocks are exact zeros), ~k x fewer MXU
    # passes.  MEASURED NEGATIVE on v5e-1 (docs/PERF.md §14.1,
    # docs/baselines/ab_r5_pack.json): 533k vs 877k nodes/s — the fold's
    # reshape is a real relayout of lane-padded narrow activations and
    # breaks GEMM-prologue fusion; stays default-OFF.
    PACK_NARROW_GEMMS: bool = False

    # Clamp the hourglass channel halving at this floor (1 = the reference
    # schedule, models.py:68-90: 128->64->...->1->...->128).  The round-4
    # re-profile (docs/PERF.md §13.3) measured the step's GEMMs 7.5x above
    # their MXU floor because the tail's <=64-channel layers under-fill
    # 128x128 MXU tiles; a floor of e.g. 32 or 128 widens the bottleneck
    # instead of folding rows (PACK_NARROW_GEMMS) — MORE capacity at near-zero
    # marginal MXU cost, but a DIFFERENT architecture (parameter shapes
    # change): opt-in, quality must be re-validated per TRAINING.md's assay
    # before it can default.  MEASURED round 5 (docs/PERF.md §14.4): min_ch=8
    # is -0.8% vs default — the narrow tail's cost is its activation streams,
    # not MXU tile fill, so no quality arm is warranted and 1 stays default.
    HOURGLASS_MIN_CHANNELS: int = 1

    # Dtype for the critic INSIDE the gradient-penalty branch (the term that
    # is differentiated twice).  "compute" follows COMPUTE_DTYPE; "float32"
    # runs just that one critic application in f32 while everything else
    # stays bf16.  WGAN-GP's regulator is the input-gradient NORM of the
    # critic at interpolates.  The 700-epoch ablation (TRAINING.md "Numerics
    # ablation"): under the threefry training default, bf16 GP converges
    # (F1 0.9733) and f32 GP buys no measurable quality (0.9601) while
    # costing 23% step time (806.6k -> 617.7k nodes/s — the GP branch is
    # 3 critic passes x N_CRITIC, all doubled to f32 bytes).  Under the
    # hardware RNG (PRNG_IMPL="rbg") bf16 GP COLLAPSED (F1 0.25) and f32 GP
    # converged 2/2 seeds (0.9888 / 0.9838) — set GP_DTYPE="float32"
    # whenever training with rbg.
    GP_DTYPE: str = "compute"

    def __post_init__(self, sanity_checking: bool = False):
        if sanity_checking:
            self.SANITY_CHECKING = True
        # GRID_SLOT_GRAPHS > 1 and GRID_BUCKETS now COMPOSE: the loader
        # routes buildings to their smallest fitting bucket and bin-packs
        # each bucket's group into slots of that shape (pipeline.py
        # _make_batches; an earlier guard made them mutually exclusive —
        # ADVICE r2 / VERDICT r3 weak #4).
        if self.SANITY_CHECKING:
            # Reference behavior (config.py:112-117): sanity mode trains on a
            # single datum with batch size 1.
            self.BATCH_SIZE = 1
            if self.DATA_POINT is None:
                self.DATA_POINT = 77
            self.PACK_GRAPHS = 1
            self.GRID_BATCH = 1

    @property
    def compute_dtype(self):
        """Activation/matmul dtype (COMPUTE_DTYPE); params stay PARAM_DTYPE."""
        import jax.numpy as jnp

        return jnp.dtype(self.COMPUTE_DTYPE)

    @property
    def param_dtype(self):
        import jax.numpy as jnp

        return jnp.dtype(self.PARAM_DTYPE)

    @property
    def SPLIT_RATIOS(self) -> Tuple[float, float, float]:
        return (self.TRAIN_SPLIT_RATIO, self.VALIDATION_SPLIT_RATIO, self.TEST_SPLIT_RATIO)

    @property
    def GLOBAL_GRAPH_DATA_PATH(self) -> str:
        return os.path.join(self.DATA_PATH, "global_graph_data")

    @property
    def LOCAL_GRAPH_DATA_PATH(self) -> str:
        return os.path.join(self.DATA_PATH, "local_graph_data")

    @property
    def VOXEL_GRAPH_DATA_PATH(self) -> str:
        return os.path.join(self.DATA_PATH, "voxel_data")

    def to_dict(self) -> Dict[str, object]:
        """Flatten config for experiment logging (reference config.py:119-135)."""
        out = {}
        for f in dataclasses.fields(self):
            out[f.name] = getattr(self, f.name)
        return out

    def replace(self, **kwargs) -> "Configuration":
        return dataclasses.replace(self, **kwargs)

    @staticmethod
    def set_seed(seed: int | None = None) -> None:
        """Seed host RNGs (reference `config.py:137-157`).

        Device randomness flows through explicit ``jax.random`` keys derived
        from ``SEED`` (quirk Q9: structure reproduced, not torch's stream).
        """
        from .utils.profiling import set_seed as _set_seed

        _set_seed(777 if seed is None else seed)
