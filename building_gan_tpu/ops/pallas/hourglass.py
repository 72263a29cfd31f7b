"""Fused hourglass GAT forward — one Pallas kernel for the whole conv stack.

The hot op of Building-GAN inference is the hourglass GNN (14 GAT layers for
the generator, reference `models.py:68-90`).  The XLA grid path materializes
each layer's activations to HBM at every fusion boundary; this kernel keeps a
tile of buildings' activations resident in VMEM across ALL layers — per-layer
HBM traffic drops to zero (weights are small and loaded once per tile).

Layout: the (F, Y, X) grid is flattened to R = F*Y*X rows per building; the
6-neighbor stencil becomes static row shifts by {+-1, +-X, +-Y*X} *within each
building's rows* (axis 1 of the (T, R, C) tile), so no cross-building bleed is
possible.  Validity masks are precomputed outside (`ops.stencil.neighbor_stack`)
and passed as an (B, R, 8) plane block (cols 0-5: per-direction neighbor
valid, col 6: cell mask).

Semantics: identical to `models.grid_layers.GridHourglass` with
``deterministic=True`` (GAT conv + GraphNorm(per-graph) + ReLU, no dropout),
GATCONV single head — the reference configuration of record
(`config.py:89-95`).  Parity is asserted in `tests/test_pallas.py`.

Weights are packed into three padded arrays so the kernel has a fixed small
input arity:
    Ws   (L, Cmax, Cmax)  conv kernels, zero-padded
    atts (L, 2,  Cmax)    att_src / att_dst
    vecs (L, 4,  Cmax)    conv bias, gn weight, gn bias, gn mean_scale
"""

from __future__ import annotations

import functools
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30


def hourglass_channel_pairs(
    hidden_dim: int, repeat: int, min_channels: int = 1
) -> List[Tuple[int, int]]:
    """(C_in, C_out) per layer of the hourglass (reference models.py:68-90).

    Derived from THE schedule (`models.grid_layers.hourglass_channels`,
    min_channels-aware) so fused-kernel weight packing can never drift from
    the flax stack it mirrors (ADVICE r4: two same-named schedules invited a
    silent reference-only import)."""
    from ...models.grid_layers import hourglass_channels

    ch = hourglass_channels(hidden_dim, repeat, min_channels)
    return list(zip([hidden_dim] + ch[:-1], ch))


def pack_gat_weights(
    encoder_params: dict, hidden_dim: int, repeat: int, min_channels: int = 1
):
    """Flax GridHourglass param subtree -> (Ws, atts, vecs) padded arrays."""
    chans = hourglass_channel_pairs(hidden_dim, repeat, min_channels)
    L = len(chans)
    cmax = max(max(ci, co) for ci, co in chans)
    Ws = np.zeros((L, cmax, cmax), np.float32)
    atts = np.zeros((L, 2, cmax), np.float32)
    vecs = np.zeros((L, 4, cmax), np.float32)
    for l, (ci, co) in enumerate(chans):
        conv = encoder_params[f"conv_{l}"]
        norm = encoder_params[f"norm_{l}"]
        Ws[l, :ci, :co] = np.asarray(conv["lin"]["kernel"])
        atts[l, 0, :co] = np.asarray(conv["att_src"])[:, 0]
        atts[l, 1, :co] = np.asarray(conv["att_dst"])[:, 0]
        vecs[l, 0, :co] = np.asarray(conv["bias"])
        vecs[l, 1, :co] = np.asarray(norm["weight"])
        vecs[l, 2, :co] = np.asarray(norm["bias"])
        vecs[l, 3, :co] = np.asarray(norm["mean_scale"])
    return jnp.array(Ws), jnp.array(atts), jnp.array(vecs)


def _row_shift(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """Circular row shift (axis 1 of (T, R, ...)): row i receives row i-k.

    Circular (not zero-fill) because Mosaic lowers rolls natively while
    pad+concat hits layout-offset limitations.  Wrapped-around rows are always
    *invalid neighbors* (they cross a grid boundary, where the per-direction
    validity plane is 0), so every wrapped contribution is masked out by the
    caller — semantics equal zero-fill shift under the mask.
    """
    return pltpu.roll(x, shift=k % x.shape[1], axis=1)  # roll wants shift >= 0


def _kernel(
    x_ref,  # (T, R, Cmax) — channel-padded input
    planes_ref,  # (T, R, 8): cols 0-5 neighbor valid, col 6 cell mask
    ws_ref,  # (L, Cmax, Cmax)
    atts_ref,  # (L, 2, Cmax)
    vecs_ref,  # (L, 4, Cmax)
    out_ref,  # (T, R, Cmax)
    *,
    num_layers: int,
    offsets: Tuple[int, ...],
    negative_slope: float,
    eps: float,
):
    """Uniform channel-padded layer loop.

    Every layer computes the full Cmax lanes (narrow hourglass layers pad to
    128 lanes on TPU regardless, so this costs nothing extra); zero-padded
    weights/att/bias/norm params keep the unused channels *exactly* zero
    through conv -> GraphNorm -> ReLU, so no channel masks are needed.  A
    ``fori_loop`` over layers means Mosaic compiles ONE layer body instead of
    an unrolled 14-layer program.
    """
    planes = planes_ref[:]
    valid = [planes[:, :, d] for d in range(6)]  # (T, R) each
    mask = planes[:, :, 6]
    cnt = jnp.maximum(jnp.sum(mask, axis=1, keepdims=True), 1.0)  # (T, 1)

    t, r, cmax = x_ref.shape

    def lrelu(v):
        return jnp.where(v >= 0, v, negative_slope * v)

    def layer(l, x):
        w = ws_ref[l]
        att_s = atts_ref[l, 0]
        att_d = atts_ref[l, 1]
        bias = vecs_ref[l, 0]
        gn_w = vecs_ref[l, 1]
        gn_b = vecs_ref[l, 2]
        gn_ms = vecs_ref[l, 3]

        h = jax.lax.dot_general(
            x.reshape(t * r, cmax), w,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        ).reshape(t, r, cmax)

        a_s = jnp.sum(h * att_s, axis=-1)  # (T, R)
        a_d = jnp.sum(h * att_d, axis=-1)

        e_self = lrelu(a_s + a_d)
        m = e_self
        es = []
        for d, off in enumerate(offsets):
            e_d = lrelu(_row_shift(a_s, off) + a_d)
            e_d = jnp.where(valid[d] > 0, e_d, _NEG_INF)
            es.append(e_d)
            m = jnp.maximum(m, e_d)

        exp_self = jnp.exp(e_self - m)
        denom = exp_self
        hm = h * mask[:, :, None]
        num = exp_self[:, :, None] * h
        for d, off in enumerate(offsets):
            exp_d = jnp.exp(es[d] - m) * valid[d]
            denom = denom + exp_d
            num = num + exp_d[:, :, None] * _row_shift(hm, off)

        x = num / jnp.maximum(denom, 1e-16)[:, :, None] + bias

        # GraphNorm per building (reference Q5 fixed: per-graph statistics)
        xm = x * mask[:, :, None]
        mean = jnp.sum(xm, axis=1, keepdims=True) / cnt[:, :, None]
        centered = x - mean * gn_ms
        var = jnp.sum((centered * centered) * mask[:, :, None], axis=1, keepdims=True) / cnt[:, :, None]
        x = gn_w * centered / jnp.sqrt(var + eps) + gn_b
        x = x * mask[:, :, None]
        return jnp.maximum(x, 0.0)  # ReLU

    x = jax.lax.fori_loop(0, num_layers, layer, x_ref[:])
    out_ref[:] = x


def hourglass_fwd(
    x: jnp.ndarray,  # (B, F, Y, X, C0)
    mask: jnp.ndarray,  # (B, F, Y, X)
    Ws: jnp.ndarray,
    atts: jnp.ndarray,
    vecs: jnp.ndarray,
    hidden_dim: int,
    repeat: int,
    tile: int = 4,
    negative_slope: float = 0.2,
    eps: float = 1e-5,
    interpret: bool = False,
    gid: jnp.ndarray | None = None,  # (B, F, Y, X) building id (cell packing)
    min_channels: int = 1,  # config.HOURGLASS_MIN_CHANNELS
) -> jnp.ndarray:
    """Fused deterministic hourglass forward over a grid batch.

    Equivalent to ``GridHourglass(...)(x, mask, deterministic=True)`` for
    conv_type='GATCONV'.  Returns (B, F, Y, X, C_last).
    """
    from ..stencil import DIRECTIONS, neighbor_mask

    b, f, y, xx, c0 = x.shape
    r = f * y * xx
    chans = tuple(hourglass_channel_pairs(hidden_dim, repeat, min_channels))
    c_last = chans[-1][1]
    cmax = max(max(ci, co) for ci, co in chans)
    assert c0 == cmax and c_last == cmax, (
        "hourglass first/last channels equal hidden_dim == Cmax by construction"
    )

    # flattened-row shift offset per direction (must mirror DIRECTIONS order)
    off_by_axis = {1: y * xx, 2: xx, 3: 1}
    offsets = tuple(off_by_axis[axis] * sh for axis, sh in DIRECTIONS)

    nbr_valid = neighbor_mask(mask, gid)  # (6, B, F, Y, X), gid-aware
    planes = jnp.concatenate(
        [
            jnp.moveaxis(nbr_valid, 0, -1).reshape(b, r, 6),
            mask.reshape(b, r, 1),
            jnp.zeros((b, r, 1), x.dtype),
        ],
        axis=-1,
    )

    xf = x.reshape(b, r, c0)
    if b % tile != 0:
        pad = tile - b % tile
        xf = jnp.concatenate([xf, jnp.zeros((pad, r, c0), x.dtype)], axis=0)
        planes = jnp.concatenate([planes, jnp.zeros((pad, r, 8), x.dtype)], axis=0)
    bp = xf.shape[0]

    kernel = functools.partial(
        _kernel, num_layers=len(chans), offsets=offsets,
        negative_slope=negative_slope, eps=eps,
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((bp, r, c_last), x.dtype),
        grid=(bp // tile,),
        in_specs=[
            pl.BlockSpec((tile, r, c0), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, r, 8), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, r, c_last), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(xf, planes, Ws, atts, vecs)
    return out[:b].reshape(b, f, y, xx, c_last)
