"""Training-core tests: metrics vs sklearn, losses, jitted step, overfit.

The single-datum overfit test is the TPU equivalent of the reference's only
debug harness (`building_gan/src/sanity.py` — overfit one building and watch
F1 rise; SURVEY.md §4).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from sklearn import metrics as skm

from building_gan_tpu.config import NUM_CLASSES
from building_gan_tpu.data import batching
from building_gan_tpu.models import VoxelGNNDiscriminator, VoxelGNNGenerator
from building_gan_tpu.train import losses as L
from building_gan_tpu.train import metrics as M
from building_gan_tpu.train.state import create_train_state, make_optimizers
from building_gan_tpu.train.step import make_eval_step, make_train_step


def tiny_cfg(small_cfg, **kw):
    base = dict(
        GENERATOR_ENCODER_REPEAT=2,
        GENERATOR_HIDDEN_DIM=32,
        LOCAL_ENCODER_HIDDEN_DIM=32,
        Z_DIM=16,
        GENERATOR_MLP_ENCODER_REPEAT=1,
        LOCAL_GRAPH_ENCODER_REPEAT=1,
        DISCRIMINATOR_ENCODER_REPEAT=2,
        DISCRIMINATOR_HIDDEN_DIM=32,
        N_CRITIC=2,
    )
    base.update(kw)
    return small_cfg.replace(**base)


# ---------------------------------------------------------------------------
# metrics vs sklearn
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_metrics_match_sklearn(seed):
    rng = np.random.default_rng(seed)
    n = 200
    # restrict to a label subset so some classes are absent (sklearn's
    # dynamic label set must be reproduced)
    y_true = rng.integers(0, 5, n).astype(np.int32)
    y_pred = rng.integers(0, 6, n).astype(np.int32)
    mask = np.ones(n, np.float32)
    mask[-20:] = 0
    graph_id = np.zeros(n, np.int32)
    graph_mask = np.ones(1, np.float32)

    m = jax.tree.map(
        np.array,
        M.compute_metrics(
            jnp.array(y_true), jnp.array(y_pred), jnp.array(mask),
            jnp.array(graph_id), jnp.array(graph_mask),
        ),
    )
    yt, yp = y_true[:-20], y_pred[:-20]
    assert np.isclose(m["f1"], skm.f1_score(yt, yp, average="macro", zero_division=0), atol=1e-6)
    assert np.isclose(
        m["precision"], skm.precision_score(yt, yp, average="macro", zero_division=0), atol=1e-6
    )
    assert np.isclose(
        m["recall"], skm.recall_score(yt, yp, average="macro", zero_division=0), atol=1e-6
    )
    assert np.isclose(m["accuracy"], skm.accuracy_score(yt, yp), atol=1e-6)


def test_per_graph_f1_min_matches_sklearn():
    rng = np.random.default_rng(3)
    sizes = [40, 60, 30]
    y_true = np.concatenate([rng.integers(0, 7, s) for s in sizes]).astype(np.int32)
    y_pred = np.concatenate([rng.integers(0, 7, s) for s in sizes]).astype(np.int32)
    graph_id = np.concatenate([np.full(s, i) for i, s in enumerate(sizes)]).astype(np.int32)
    n = y_true.shape[0]
    mask = np.ones(n, np.float32)
    graph_mask = np.array([1, 1, 1, 0], np.float32)  # one padded graph slot
    gid = np.concatenate([graph_id, np.array([4], np.int32)])  # padded node -> dummy
    y_true_p = np.concatenate([y_true, np.array([0], np.int32)])
    y_pred_p = np.concatenate([y_pred, np.array([0], np.int32)])
    mask_p = np.concatenate([mask, np.zeros(1, np.float32)])

    m = M.compute_metrics(
        jnp.array(y_true_p), jnp.array(y_pred_p), jnp.array(mask_p),
        jnp.array(gid), jnp.array(graph_mask),
    )
    expected = []
    start = 0
    for s in sizes:
        expected.append(
            skm.f1_score(
                y_true[start : start + s], y_pred[start : start + s],
                average="macro", zero_division=0,
            )
        )
        start += s
    assert np.isclose(float(m["f1_min"]), min(expected), atol=1e-6)

    # per-graph F1 histogram: one count per REAL graph, in the right bin
    # (the psum-able replacement for the reference's per-graph F1 list,
    # trainer.py:418-441); the padded slot must contribute nothing.
    hist = np.asarray(m["per_graph_f1_hist"])
    assert hist.shape == (M.F1_HIST_BINS,)
    assert hist.sum() == len(sizes)
    for f1 in expected:
        b = min(int(f1 * M.F1_HIST_BINS), M.F1_HIST_BINS - 1)
        assert hist[b] >= 1
    # quantiles from the histogram bracket the true values to bin width
    w = 1.0 / M.F1_HIST_BINS
    assert abs(M.hist_quantile(hist, 0.0) - min(expected)) <= w
    assert abs(M.hist_quantile(hist, 1.0) - max(expected)) <= w
    assert abs(M.hist_quantile(hist, 0.5) - sorted(expected)[1]) <= w


def test_per_graph_f1_hist_edge_cases():
    # F1 == 1.0 lands in the LAST bin (not out of range); empty mask -> 0s
    hist = np.asarray(
        M.per_graph_f1_hist(jnp.array([1.0, 0.0, 0.5]), jnp.array([1.0, 1.0, 0.0]))
    )
    assert hist[-1] == 1 and hist[0] == 1 and hist.sum() == 2
    assert M.hist_quantile(np.zeros(M.F1_HIST_BINS), 0.5) == 0.0


# ---------------------------------------------------------------------------
# losses
# ---------------------------------------------------------------------------


def test_generated_far_matches_reference_formula(synthetic_samples, small_cfg):
    packed = batching.pack_graphs(synthetic_samples[:3], small_cfg)[0]
    onehot = jax.nn.one_hot(packed.voxel_type, NUM_CLASSES)
    far_gen = np.array(L.generated_far(packed, onehot))
    # with ground-truth labels the generated FAR equals the true FAR
    real = packed.graph_mask > 0
    np.testing.assert_allclose(far_gen[real], packed.far[real], rtol=1e-4)


def test_gradient_penalty_unit_norm_is_zero(small_cfg):
    """A critic with exactly unit-norm label gradients gives zero penalty."""
    n = 16
    mask = jnp.ones(n)

    def d_apply(label):  # d/dlabel = [1, 0, ..., 0] per node -> norm 1
        return label[:, :1]

    key = jax.random.key(0)
    onehot = jax.nn.one_hot(jnp.zeros(n, jnp.int32), NUM_CLASSES)
    soft = jnp.full((n, NUM_CLASSES), 1.0 / NUM_CLASSES)
    gp = L.gradient_penalty(d_apply, onehot, soft, mask, key, lambda_gp=10.0)
    assert float(gp) < 1e-6


def test_masked_mean_ignores_padding():
    v = jnp.array([[1.0], [2.0], [100.0]])
    mask = jnp.array([1.0, 1.0, 0.0])
    assert float(L.masked_mean(v, mask)) == pytest.approx(1.5)


# ---------------------------------------------------------------------------
# jitted train step + overfit
# ---------------------------------------------------------------------------


@pytest.mark.heavy  # full-step CPU compile (>100 s; core tier excludes)
def test_train_step_runs_and_updates(synthetic_samples, small_cfg):
    cfg = tiny_cfg(small_cfg)
    packed = batching.pack_graphs(synthetic_samples[:2], cfg)[0]
    gen = VoxelGNNGenerator(configuration=cfg)
    disc = VoxelGNNDiscriminator(configuration=cfg)
    key = jax.random.key(0)
    state, tx_g, tx_d = create_train_state(cfg, gen, disc, packed, key, total_g_updates=10)
    step = jax.jit(make_train_step(cfg, gen, disc, tx_g, tx_d))

    state2, metrics = step(state, packed, jax.random.key(1))
    assert int(state2.step) == 1
    for k in ("g_loss", "d_loss", "f1", "f1_min", "precision", "recall", "accuracy"):
        assert np.isfinite(float(metrics[k])), k
    # params actually changed
    diff = jax.tree.reduce(
        lambda a, b: a + b,
        jax.tree.map(lambda a, b: float(jnp.abs(a - b).sum()), state.params_g, state2.params_g),
    )
    assert diff > 0


def test_eval_step_runs(synthetic_samples, small_cfg):
    cfg = tiny_cfg(small_cfg)
    packed = batching.pack_graphs(synthetic_samples[:2], cfg)[0]
    gen = VoxelGNNGenerator(configuration=cfg)
    disc = VoxelGNNDiscriminator(configuration=cfg)
    state, _, _ = create_train_state(cfg, gen, disc, packed, jax.random.key(0), 10)
    ev = jax.jit(make_eval_step(cfg, gen, disc))
    m = ev(state, packed, jax.random.key(5))
    assert np.isfinite(float(m["f1"]))


@pytest.mark.slow
def test_sanity_overfit_one_building(synthetic_samples, small_cfg):
    """Overfit a single building: F1 must climb well above chance.

    Mirrors the reference sanity.py harness (SURVEY.md §4.1).  To keep the
    test fast and deterministic the supervised CE term (LAMBDA_LABEL, zero in
    the reference config) is enabled so the generator gets a direct gradient
    instead of waiting thousands of critic updates for the WGAN signal.
    """
    cfg = tiny_cfg(
        small_cfg, N_CRITIC=1, PACK_GRAPHS=1, LAMBDA_LABEL=10.0,
        LEARNING_RATE_GENERATOR=1e-3,
        PACK_VOXEL_NODES=512, PACK_VOXEL_EDGES=4096,
        PACK_LOCAL_NODES=128, PACK_LOCAL_EDGES=1024,
    )
    sample = synthetic_samples[0]
    packed = batching.pack_one([sample], cfg)
    gen = VoxelGNNGenerator(configuration=cfg)
    disc = VoxelGNNDiscriminator(configuration=cfg)
    n_steps = 1500
    state, tx_g, tx_d = create_train_state(cfg, gen, disc, packed, jax.random.key(0), n_steps)
    step = make_train_step(cfg, gen, disc, tx_g, tx_d)

    @jax.jit
    def run_chunk(state, base_key):
        def body(carry, i):
            st, _ = carry
            st, metrics = step(st, packed, jax.random.fold_in(base_key, i))
            return (st, metrics["f1"]), None

        (state, f1), _ = jax.lax.scan(body, (state, jnp.zeros(())), jnp.arange(100))
        return state, f1

    f1_first = None
    for chunk in range(n_steps // 100):
        state, f1 = run_chunk(state, jax.random.fold_in(jax.random.key(42), chunk))
        if f1_first is None:
            f1_first = float(f1)
    f1_last = float(f1)
    assert f1_last > 0.5, f"overfit failed: f1 {f1_first} -> {f1_last}"
    assert f1_last > f1_first


def test_cosine_lr_matches_torch_scheduler(small_cfg):
    """Per-epoch G LR == torch CosineAnnealingLR(T_max=EPOCHS) trajectory
    (reference train.py:36-38), for any pack-count-per-epoch."""
    torch = pytest.importorskip("torch")

    cfg = small_cfg.replace(EPOCHS=17, LEARNING_RATE_GENERATOR=1e-4)
    from building_gan_tpu.train.state import cosine_lr

    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.Adam([p], lr=cfg.LEARNING_RATE_GENERATOR)
    sched = torch.optim.lr_scheduler.CosineAnnealingLR(opt, T_max=cfg.EPOCHS)
    for epoch in range(1, cfg.EPOCHS + 1):
        want = opt.param_groups[0]["lr"]  # LR in effect during this epoch
        got = cosine_lr(cfg, epoch)
        assert np.isclose(got, want, rtol=1e-6), f"epoch {epoch}: {got} != {want}"
        sched.step()


@pytest.mark.heavy  # full-step CPU compile (>100 s; core tier excludes)
def test_set_g_lr_flows_into_update(synthetic_samples, small_cfg):
    """The injected hyperparameter actually drives the Adam update size."""
    from building_gan_tpu.train.state import set_g_lr

    cfg = tiny_cfg(small_cfg)
    packed = batching.pack_graphs(synthetic_samples[:2], cfg)[0]
    gen = VoxelGNNGenerator(configuration=cfg)
    disc = VoxelGNNDiscriminator(configuration=cfg)
    state, tx_g, tx_d = create_train_state(cfg, gen, disc, packed, jax.random.key(0), 10)
    step = jax.jit(make_train_step(cfg, gen, disc, tx_g, tx_d))

    zeroed = set_g_lr(state, 0.0)
    s2, _ = step(zeroed, packed, jax.random.key(1))
    for a, b in zip(jax.tree.leaves(state.params_g), jax.tree.leaves(s2.params_g)):
        np.testing.assert_array_equal(np.array(a), np.array(b))


@pytest.mark.slow
def test_sanity_overfit_adversarial_only(synthetic_samples, small_cfg):
    """Reference sanity.py semantics: LAMBDA_LABEL=0 — WGAN-GP + FAR/ratio
    losses ONLY, single building, F1 must climb well above chance.

    Unlike test_sanity_overfit_one_building (which adds a CE term for speed),
    this guards the REAL loss path: the generator learns purely from the
    critic + the ratio/FAR auxiliary losses (reference trainer.py:484-495,
    config.py LAMBDA_LABEL=0).  Measured trajectories on this config: F1
    sits at chance (~0.2) for 3-4k steps, then climbs through 0.3-0.45
    around 5-6k and on toward 0.6-0.8 by 8-10k.  The climb onset is
    CHAOTIC: any rounding-level change anywhere in the stack (XLA fusion
    choices, reduction order, backend thread split) shifts it by thousands
    of steps (an 8k horizon measured best-F1 0.287 on one compile and 0.45+
    on another of the same program).  The horizon is therefore 14k; the
    loop breaks at the bar, so healthy runs stop around 5-6k.
    """
    cfg = tiny_cfg(
        small_cfg, PACK_GRAPHS=1, LAMBDA_LABEL=0.0,
        PACK_VOXEL_NODES=512, PACK_VOXEL_EDGES=4096,
        PACK_LOCAL_NODES=128, PACK_LOCAL_EDGES=1024,
    )
    sample = synthetic_samples[0]
    packed = batching.pack_one([sample], cfg)
    gen = VoxelGNNGenerator(configuration=cfg)
    disc = VoxelGNNDiscriminator(configuration=cfg)
    n_steps, chunk = 14000, 200
    state, tx_g, tx_d = create_train_state(cfg, gen, disc, packed, jax.random.key(0), n_steps)
    step = make_train_step(cfg, gen, disc, tx_g, tx_d)

    @jax.jit
    def run_chunk(state, base_key):
        def body(carry, i):
            st, _ = carry
            st, metrics = step(st, packed, jax.random.fold_in(base_key, i))
            return (st, metrics["f1"]), metrics["f1"]

        (state, _), f1s = jax.lax.scan(body, (state, jnp.zeros(())), jnp.arange(chunk))
        return state, f1s

    # WGAN overfits at this scale CLIMB then sometimes collapse (mode
    # instability), so the sanity criterion is "F1 ever climbs well above
    # chance", not a final-window value; stop as soon as it has.
    early_means, best = [], 0.0
    for c in range(n_steps // chunk):
        state, f1s = run_chunk(state, jax.random.fold_in(jax.random.key(42), c))
        if c < 5:
            early_means.append(float(jnp.mean(f1s)))
        best = max(best, float(jnp.max(f1s)))
        # chance floor = MEAN of the first 1k steps (a max would catch noise
        # spikes: macro-F1 on one ~150-voxel building fluctuates to ~0.28)
        early = sum(early_means) / len(early_means)
        if c >= 5 and best > 0.3 and best > early + 0.12:
            break
    assert best > 0.3, f"adversarial-only overfit failed: best F1 {best}"
    assert best > early + 0.12, f"no climb above chance: {early:.3f} -> {best:.3f}"
