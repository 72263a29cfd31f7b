"""Fused GAT+GraphNorm+ReLU+dropout layer with a custom-VJP Pallas backward.

docs/PERF.md: the WGAN-GP train step is HBM-bandwidth-bound — 68% of its time
is elementwise "loop fusion" moving each hourglass layer's activations
through HBM ~8-12x (attention stack, softmax, norm statistics, apply, relu,
dropout are all separate fusion boundaries in the XLA path).  This module
fuses ONE ENTIRE LAYER into a single Pallas kernel each way:

    forward : read x, write y                          (2 block passes)
    backward: read x + gy, recompute in VMEM, write gx (3 block passes)

The backward RECOMPUTES the attention/normalization internals from the saved
layer input instead of spilling them — bandwidth is the scarce resource, the
MXU is ~99% idle (docs/PERF.md §3), so recompute is free.

Semantics are `models.grid_layers.GridHourglass`'s layer body exactly
(GATCONV + per-(slot,building) GraphNorm + ReLU + byte-entropy dropout —
reference models.py:68-90 re-designed for the dense grid):

- attention: masked softmax over {6 static row-shift neighbors + self}
  (ops/stencil.py `stencil_gat_flat`), wrapped rows invalidated by the
  per-direction boundary planes;
- GraphNorm: masked per-building statistics keyed on the gid plane
  (K buildings bin-packed per slot), one-pass mean/ex2 moments with the
  `mean_scale` parameter (quirk Q5 semantics of the reference's GraphNorm);
- dropout: the byte-threshold scheme of `ops.dropout.FastDropout` driven by
  the in-kernel TPU PRNG (`pltpu.prng_seed` + `prng_random_bits`); the
  backward reseeds identically, so the mask is bit-reproducible without ever
  being written to HBM.  (The RNG STREAM differs from the XLA path's
  threefry — same Bernoulli(rate) semantics, different draws.)

The layer is scanned over the hourglass depth with stacked (L, ...) weights
(`hourglass_train`): one Mosaic compile for the forward body and one for the
backward body regardless of depth.  Channel padding follows
`ops/pallas/hourglass.py`: every layer computes Cmax lanes; zero-padded
weights keep unused channels exactly zero end to end.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .hourglass import hourglass_channel_pairs, pack_gat_weights  # noqa: F401 (re-export)

_NEG_INF = -1e30

# The recompute backward keeps ~a dozen (tile, R, C) f32 temporaries live; at
# bench scale that exceeds XLA:TPU's default 16 MiB scoped-vmem budget.  Pass
# these to jax.jit(..., compiler_options=...) (or .compile()) for any program
# embedding the fused training kernel.  (The local XLA_FLAGS parser rejects
# TPU-only flags on CPU clients, so this must travel as compiler options.)
TRAIN_COMPILER_OPTIONS = {"xla_tpu_scoped_vmem_limit_kib": 65536}


def _row_shift(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """Circular row shift on axis 1 of (T, R, ...): row i receives row i-k.

    Wrapped rows are always invalid neighbors (masked by the validity
    planes), so circular == zero-fill under the mask (see hourglass.py)."""
    return pltpu.roll(x, shift=k % x.shape[1], axis=1)


def _attention_forward(x, planes, w, att_s, att_d, offsets, negative_slope):
    """Shared fwd math: returns (h, hm, u, alpha_self, alphas, pres) in f32.

    u is the attention output WITHOUT bias/mask; pres are the pre-LeakyReLU
    attention logits (needed for the backward's lrelu')."""
    t, r, cmax = x.shape
    valid = [planes[:, :, d] for d in range(6)]
    mask = planes[:, :, 6]

    h = jax.lax.dot_general(
        x.reshape(t * r, cmax).astype(jnp.float32), w,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).reshape(t, r, cmax)
    hm = h * mask[:, :, None]

    a_s = jnp.sum(h * att_s, axis=-1)  # (T, R)
    a_d = jnp.sum(h * att_d, axis=-1)

    def lrelu(v):
        return jnp.where(v >= 0, v, negative_slope * v)

    pre_self = a_s + a_d
    e_self = lrelu(pre_self)
    m = e_self
    es, pres = [], []
    for d, off in enumerate(offsets):
        pre_d = _row_shift(a_s, off) + a_d
        e_d = jnp.where(valid[d] > 0, lrelu(pre_d), _NEG_INF)
        pres.append(pre_d)
        es.append(e_d)
        m = jnp.maximum(m, e_d)

    p_self = jnp.exp(e_self - m)
    den = p_self
    ps = []
    for d in range(6):
        p_d = jnp.exp(es[d] - m) * valid[d]
        ps.append(p_d)
        den = den + p_d
    den = jnp.maximum(den, 1e-16)

    alpha_self = p_self / den
    alphas = [ps[d] / den for d in range(6)]
    u = alpha_self[:, :, None] * h
    for d, off in enumerate(offsets):
        u = u + alphas[d][:, :, None] * _row_shift(hm, off)
    return h, hm, u, alpha_self, alphas, [pre_self] + pres


def _rowsum(m2d):
    """(T, R) -> (T, 1) masked count via an MXU dot.

    Mosaic (as of jax 0.9) miscompiles plain lane reductions of (T, R)
    vectors at R=1584 with T=1..2 tiles (internal vector.multi_reduction
    layout error); a dot with a ones vector lowers cleanly and is free on
    the idle MXU."""
    t, r = m2d.shape
    ones = jnp.ones((r, 1), jnp.float32)
    return jax.lax.dot_general(
        m2d, ones, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _norm_stats(v, mask, gidp, K, gn_ms, eps):
    """Masked per-(tile-slot, building) GraphNorm moments.

    Returns per-building lists (mk, n, mu, s, rstd): mk is the (T, R) member
    mask, the rest are (T, 1)/(T, 1, C) per-building constants.  K is
    small/static, so the keyed reduction is a python loop over K masked VMEM
    reductions.  Keeping the stats per-building (instead of broadcasting
    three full (T, R, C) planes through the gid map) is what lets the
    recompute-backward fit the VMEM budget at bench scale."""
    stats = []
    for k in range(K):
        mk = mask * (gidp == float(k)) if K > 1 else mask
        mk3 = mk[:, :, None]
        n = jnp.maximum(_rowsum(mk), 1.0)  # (T,1)
        s1 = jnp.sum(v * mk3, axis=1, keepdims=True)  # (T,1,C)
        s2 = jnp.sum(v * v * mk3, axis=1, keepdims=True)
        mu = s1 / n[:, :, None]
        ex2 = s2 / n[:, :, None]
        s = mu * gn_ms
        var = jnp.maximum(ex2 - 2.0 * s * mu + s * s, 0.0)
        rstd = jax.lax.rsqrt(var + eps)
        stats.append((mk, n, mu, s, rstd))
    return stats


def _norm_apply(v, stats, mask, gn_w, gn_b):
    """z = GraphNorm(v) from per-building stats, one accumulation pass."""
    z = jnp.zeros_like(v)
    for mk, _, _, s, rstd in stats:
        z = z + mk[:, :, None] * ((v - s) * rstd)
    return (z * gn_w + gn_b) * mask[:, :, None]


def _dropout_bits(shape, drop_levels):
    """Byte-threshold keep mask from the in-kernel PRNG (FastDropout scheme)."""
    bits = pltpu.prng_random_bits(shape)  # int32
    byte = jnp.bitwise_and(bits, 255)
    return (byte >= drop_levels).astype(jnp.float32)


def _fwd_kernel(
    seed_ref, x_ref, planes_ref, w_ref, att_ref, vec_ref, out_ref,
    *, offsets, K, negative_slope, eps, drop_levels,
):
    planes = planes_ref[:].astype(jnp.float32)
    mask = planes[:, :, 6]
    gidp = planes[:, :, 7]
    w = w_ref[:].astype(jnp.float32)
    att_s = att_ref[0].astype(jnp.float32)
    att_d = att_ref[1].astype(jnp.float32)
    bias = vec_ref[0].astype(jnp.float32)
    gn_w = vec_ref[1].astype(jnp.float32)
    gn_b = vec_ref[2].astype(jnp.float32)
    gn_ms = vec_ref[3].astype(jnp.float32)

    x = x_ref[:].astype(jnp.float32)
    _, _, u, _, _, _ = _attention_forward(
        x, planes, w, att_s, att_d, offsets, negative_slope
    )
    v = u * mask[:, :, None] + bias

    stats = _norm_stats(v, mask, gidp, K, gn_ms, eps)
    z = _norm_apply(v, stats, mask, gn_w, gn_b)
    y = jnp.maximum(z, 0.0)

    if drop_levels > 0:
        pltpu.prng_seed(seed_ref[0], pl.program_id(0))
        keep = _dropout_bits(y.shape, drop_levels)
        y = y * keep * (256.0 / (256.0 - drop_levels))

    out_ref[:] = y.astype(out_ref.dtype)


def _bwd_kernel(
    seed_ref, x_ref, planes_ref, w_ref, att_ref, vec_ref, gy_ref,
    gx_ref, gw_ref, gatt_ref, gvec_ref,
    *, offsets, K, negative_slope, eps, drop_levels,
):
    planes = planes_ref[:].astype(jnp.float32)
    valid = [planes[:, :, d] for d in range(6)]
    mask = planes[:, :, 6]
    gidp = planes[:, :, 7]
    w = w_ref[:].astype(jnp.float32)
    att_s = att_ref[0].astype(jnp.float32)
    att_d = att_ref[1].astype(jnp.float32)
    bias = vec_ref[0].astype(jnp.float32)
    gn_w = vec_ref[1].astype(jnp.float32)
    gn_b = vec_ref[2].astype(jnp.float32)
    gn_ms = vec_ref[3].astype(jnp.float32)

    t, r, cmax = x_ref.shape
    x = x_ref[:].astype(jnp.float32)
    gy = gy_ref[:].astype(jnp.float32)

    # ---- recompute forward internals in VMEM ----
    h, hm, u, alpha_self, alphas, pres = _attention_forward(
        x, planes, w, att_s, att_d, offsets, negative_slope
    )
    v = u * mask[:, :, None] + bias
    stats = _norm_stats(v, mask, gidp, K, gn_ms, eps)
    z = _norm_apply(v, stats, mask, gn_w, gn_b)

    # ---- dropout + relu backward ----
    if drop_levels > 0:
        pltpu.prng_seed(seed_ref[0], pl.program_id(0))
        keep = _dropout_bits(z.shape, drop_levels)
        gy = gy * keep * (256.0 / (256.0 - drop_levels))
    gz = jnp.where(z > 0, gy, 0.0) * mask[:, :, None]

    # ---- GraphNorm backward (per building k; masked, mean_scale-aware) ----
    # z_i = (v_i - s) * inv + b,  s = ms*mu,  inv = w_gn * rstd
    # dv_j = m_j [ gz_j*inv - (ms/n) inv G1 - (inv*rstd^2/n)(v_j - 2s + s*ms) G2 ]
    #   G1 = sum_i m_i gz_i,  G2 = sum_i m_i gz_i (v_i - s)
    gv = jnp.zeros_like(v)
    gw_gn = jnp.zeros((1, 1, cmax), jnp.float32)
    gb_gn = jnp.zeros((1, 1, cmax), jnp.float32)
    gms_gn = jnp.zeros((1, 1, cmax), jnp.float32)
    for mk, n2, mu_k, s_k, rstd_k in stats:
        mk3 = mk[:, :, None]
        n = n2[:, :, None]  # (T,1,1)
        inv_k = rstd_k * gn_w  # (T,1,C) per-building constant
        gzk = gz * mk3
        G1 = jnp.sum(gzk, axis=1, keepdims=True)  # (T,1,C)
        G2 = jnp.sum(gzk * (v - s_k), axis=1, keepdims=True)
        gv = gv + mk3 * (
            gz * inv_k
            - (gn_ms / n) * inv_k * G1
            - (inv_k * rstd_k * rstd_k / n) * (v - 2.0 * s_k + s_k * gn_ms) * G2
        )
        # parameter grads, accumulated over buildings (all reduce to (C,))
        gw_gn = gw_gn + G2 * rstd_k
        gb_gn = gb_gn + G1
        gms_gn = gms_gn + (
            -mu_k * inv_k * G1 - inv_k * rstd_k * rstd_k * mu_k * (s_k - mu_k) * G2
        )

    # ---- attention backward ----
    gu = gv * mask[:, :, None]
    gbias = jnp.sum(gv, axis=(0, 1))  # (C,)

    # value paths
    gh = alpha_self[:, :, None] * gu
    ghm = jnp.zeros_like(h)
    for d, off in enumerate(offsets):
        ghm = ghm + _row_shift(alphas[d][:, :, None] * gu, -off)
    gh = gh + ghm * mask[:, :, None]

    # score paths: dalpha -> softmax -> lrelu' -> a_s/a_d
    dalpha_self = jnp.sum(gu * h, axis=-1)  # (T,R)
    dalphas = [
        jnp.sum(gu * _row_shift(hm, off), axis=-1) for off in offsets
    ]
    S = alpha_self * dalpha_self
    for d in range(6):
        S = S + alphas[d] * dalphas[d]

    def lrelu_g(pre):
        return jnp.where(pre >= 0, 1.0, negative_slope)

    de_self = alpha_self * (dalpha_self - S) * lrelu_g(pres[0])
    da_d = de_self
    da_s = de_self
    for d, off in enumerate(offsets):
        de_d = alphas[d] * (dalphas[d] - S) * lrelu_g(pres[1 + d])
        da_d = da_d + de_d
        da_s = da_s + _row_shift(de_d, -off)

    gh = gh + da_s[:, :, None] * att_s + da_d[:, :, None] * att_d
    gatt_s = jnp.sum(da_s[:, :, None] * h, axis=(0, 1))  # (C,)
    gatt_d = jnp.sum(da_d[:, :, None] * h, axis=(0, 1))

    # ---- conv backward ----
    gh2 = gh.reshape(t * r, cmax)
    gx = jax.lax.dot_general(
        gh2, w, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).reshape(t, r, cmax)
    gw = jax.lax.dot_general(
        x.reshape(t * r, cmax), gh2,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    gx_ref[:] = gx.astype(gx_ref.dtype)

    # parameter grads accumulate across sequential grid steps
    @pl.when(pl.program_id(0) == 0)
    def _init():
        gw_ref[:] = jnp.zeros_like(gw_ref)
        gatt_ref[:] = jnp.zeros_like(gatt_ref)
        gvec_ref[:] = jnp.zeros_like(gvec_ref)

    gw_ref[:] += gw.astype(gw_ref.dtype)
    gatt_ref[0] += gatt_s.astype(gatt_ref.dtype)
    gatt_ref[1] += gatt_d.astype(gatt_ref.dtype)
    gvec_ref[0] += gbias.astype(gvec_ref.dtype)
    gvec_ref[1] += gw_gn[0, 0].astype(gvec_ref.dtype)
    gvec_ref[2] += gb_gn[0, 0].astype(gvec_ref.dtype)
    gvec_ref[3] += gms_gn[0, 0].astype(gvec_ref.dtype)


def make_fused_layer(
    offsets: Tuple[int, ...],
    K: int,
    drop_levels: int,
    tile: int = 2,
    negative_slope: float = 0.2,
    eps: float = 1e-5,
    interpret: bool = False,
):
    """Build the custom-VJP fused layer fn: (x, planes, w, att, vec, seed) -> y.

    x: (Bp, R, C) channel-padded activations (Bp % tile == 0)
    planes: (Bp, R, 8) — 6 neighbor-valid, mask, gid (float)
    w: (C, C), att: (2, C), vec: (4, C) — packed as in hourglass.py
    seed: (1,) int32 dropout seed for this layer
    """

    def _call(kernel, outs, x, planes, w, att, vec, seed, extra=()):
        bp, r, cmax = x.shape
        grid = (bp // tile,)
        in_specs = [
            pl.BlockSpec((tile, r, cmax), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, r, 8), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ]
        args = [x, planes, w, att, vec]
        for e in extra:
            in_specs.append(
                pl.BlockSpec((tile, r, cmax), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM)
            )
            args.append(e)
        return pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1, grid=grid, in_specs=in_specs, out_specs=outs[0]
            ),
            out_shape=outs[1],
            # the recompute-heavy bodies keep ~half a dozen (tile,R,C) f32
            # temporaries live; the default 16 MiB scoped-vmem budget is too
            # small at bench scale (R=1584, C=128) — v5e has 128 MiB VMEM
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024
            ),
            interpret=interpret,
        )(seed, *args)

    fwd_kernel = functools.partial(
        _fwd_kernel, offsets=offsets, K=K,
        negative_slope=negative_slope, eps=eps, drop_levels=drop_levels,
    )
    bwd_kernel = functools.partial(
        _bwd_kernel, offsets=offsets, K=K,
        negative_slope=negative_slope, eps=eps, drop_levels=drop_levels,
    )

    @jax.custom_vjp
    def layer(x, planes, w, att, vec, seed):
        bp, r, cmax = x.shape
        outs = (
            pl.BlockSpec((tile, r, cmax), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
            jax.ShapeDtypeStruct((bp, r, cmax), x.dtype),
        )
        return _call(fwd_kernel, outs, x, planes, w, att, vec, seed)

    def layer_fwd(x, planes, w, att, vec, seed):
        return layer(x, planes, w, att, vec, seed), (x, planes, w, att, vec, seed)

    def layer_bwd(res, gy):
        x, planes, w, att, vec, seed = res
        bp, r, cmax = x.shape
        outs = (
            [
                pl.BlockSpec((tile, r, cmax), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((cmax, cmax), lambda i, *_: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((2, cmax), lambda i, *_: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((4, cmax), lambda i, *_: (0, 0), memory_space=pltpu.VMEM),
            ],
            [
                jax.ShapeDtypeStruct((bp, r, cmax), x.dtype),
                jax.ShapeDtypeStruct((cmax, cmax), jnp.float32),
                jax.ShapeDtypeStruct((2, cmax), jnp.float32),
                jax.ShapeDtypeStruct((4, cmax), jnp.float32),
            ],
        )
        gx, gw, gatt, gvec = _call(
            bwd_kernel, outs, x, planes, w, att, vec, seed, extra=(gy,)
        )
        return (
            gx,
            jnp.zeros_like(planes),
            gw.astype(w.dtype),
            gatt.astype(att.dtype),
            gvec.astype(vec.dtype),
            np.zeros(seed.shape, dtype=jax.dtypes.float0),
        )

    layer.defvjp(layer_fwd, layer_bwd)
    return layer


def build_planes(mask: jnp.ndarray, gid, grid_shape) -> jnp.ndarray:
    """(B, R, 8) plane block: 6 neighbor-valid, cell mask, gid (float).

    The neighbor-valid planes are gid-aware (a face across two different
    buildings is not an edge), so gap-free cell packing is safe here too —
    the kernels weight every neighbor contribution by these planes."""
    from ..stencil import _nbr_valid_flat

    b = mask.shape[0]
    maskf = mask.reshape(b, -1).astype(jnp.float32)
    gidr = None if gid is None else gid.reshape(b, -1)
    nbr = _nbr_valid_flat(maskf, tuple(grid_shape), gidr)  # (6, B, R)
    gidp = jnp.zeros_like(maskf) if gidr is None else gidr.astype(jnp.float32)
    return jnp.concatenate(
        [jnp.moveaxis(nbr, 0, -1), maskf[..., None], gidp[..., None]], axis=-1
    )


def flat_offsets(grid_shape) -> Tuple[int, ...]:
    """Row-shift offset per direction, mirroring stencil.DIRECTIONS order."""
    f, y, x = grid_shape
    off_by_axis = {1: y * x, 2: x, 3: 1}
    from ..stencil import DIRECTIONS

    return tuple(off_by_axis[axis] * sh for axis, sh in DIRECTIONS)


def hourglass_train(
    x: jnp.ndarray,  # (B, R, Cmax) channel-padded (Cmax == hidden_dim)
    planes: jnp.ndarray,  # (B, R, 8) from build_planes
    Ws: jnp.ndarray,  # (L, Cmax, Cmax)
    atts: jnp.ndarray,  # (L, 2, Cmax)
    vecs: jnp.ndarray,  # (L, 4, Cmax)
    seeds: jnp.ndarray,  # (L,) int32 per-layer dropout seeds
    grid_shape: Tuple[int, int, int],
    K: int = 1,
    dropout_rate: float = 0.0,
    deterministic: bool = False,
    tile: int = 2,
    negative_slope: float = 0.2,
    eps: float = 1e-5,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Differentiable fused hourglass: scan the custom-VJP layer over depth.

    Gradients flow to x, Ws, atts, vecs (NOT planes/seeds).  Bp is padded to
    a multiple of `tile`; Mosaic compiles ONE forward and ONE backward body
    for any depth L (the scan reuses them).

    ``interpret=None`` resolves to interpret mode on non-TPU backends (tests,
    the CPU-mesh dryrun) and real Mosaic kernels on TPU.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    drop_levels = 0 if deterministic else int(round(dropout_rate * 256.0))
    if interpret is True and drop_levels > 0:
        # the plain HLO interpreter has no lowering for the TPU PRNG
        # primitives (prng_seed/prng_random_bits) on CPU; the Mosaic TPU
        # interpreter executes them faithfully
        interpret = pltpu.InterpretParams()
    offsets = flat_offsets(grid_shape)

    b, r, cmax = x.shape
    pad = (-b) % tile
    if pad:
        x = jnp.concatenate([x, jnp.zeros((pad, r, cmax), x.dtype)], axis=0)
        planes = jnp.concatenate([planes, jnp.zeros((pad, r, 8), planes.dtype)], axis=0)

    layer = make_fused_layer(
        offsets, K, drop_levels, tile=tile,
        negative_slope=negative_slope, eps=eps, interpret=interpret,
    )

    def body(h, per_layer):
        w, att, vec, seed = per_layer
        return layer(h, planes, w, att, vec, seed[None]), None

    y, _ = jax.lax.scan(body, x, (Ws, atts, vecs, seeds))
    return y[:b]
