"""Microbenchmark the device's attainable peaks for the roofline model.

Measures, on the default backend (the real TPU under axon):

- hbm_gbps: streaming HBM bandwidth — a chain of K elementwise kernels
  separated by `lax.optimization_barrier` (so XLA cannot fuse them into one
  read+write) over an array much larger than VMEM; bytes = 2*K*N*itemsize.
- vpu_gops: elementwise VPU throughput — one fused chain of K non-foldable
  polynomial steps (y = y*y + 0.25, fixed point 0.5) on an HBM-resident
  array; ops = 2*K*N (the measured peak counts a fused multiply-add as 2,
  matching how utils/roofline.py counts work).
- trans_gops: transcendental throughput — a fused chain of exp(-y) steps.
- mxu_tflops: bf16 matmul with f32 accumulation at MXU-friendly shape.

Sync discipline (the bug history of this probe): under the tunneled axon
backend `jax.block_until_ready` returns BEFORE the device work completes —
only fetching a VALUE forces real completion (bench.py syncs the same way).
Every timing here therefore ends with a 1-element fetch, and the measured
dispatch+fetch overhead of an empty kernel is subtracted.  The tunnel's
overhead is LARGE (~30 ms) and noisy, so every chain is sized to >=300 ms of
device work (a first cut at 20-40 ms produced a NEGATIVE transcendental
throughput — the chain beat the measured overhead).  A second historical bug: multiplying
by 1 + 2^-10 "exact in bf16" — bf16 has 7 fraction bits, the constant
rounded to 1.0 and XLA elided the whole kernel (33 TB/s "measured").  The
chain constants here (x2.0 / x0.5) are exact in every dtype and cannot fold
across the barriers.

These are *attainable* peaks (real kernels through XLA, not datasheet
numbers), which is what the roofline floor should divide by.  Results are
committed in `building_gan_tpu/utils/roofline.py::MEASURED_PEAKS_V5E` with
the measurement recorded in docs/PERF.md §13.

Usage: python scripts/roofline_peaks.py  ->  one JSON line
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def _sync(out):
    """Force real completion: fetch one element (see module docstring)."""
    x = out[0] if isinstance(out, (tuple, list)) else out
    while x.ndim > 0:
        x = x[0]
    return float(x)


def _time_call(compiled, *args, reps=4):
    out = compiled(*args)
    _sync(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = compiled(*args)
        _sync(out)
        ts.append(time.perf_counter() - t0)
    return min(ts)


def _overhead():
    """Dispatch + 1-element-fetch round trip of an empty-ish kernel."""
    x = jnp.zeros((8,), jnp.float32)
    c = jax.jit(lambda x: x + 1.0).lower(x).compile()
    return _time_call(c, x, reps=8)


def hbm_stream(n_bytes=512 * 1024 * 1024, k=128, dtype=jnp.bfloat16, oh=0.0):
    n = n_bytes // np.dtype(dtype).itemsize
    x = jnp.full((n,), 0.5, dtype)
    c2 = jnp.asarray(2.0, dtype)
    ch = jnp.asarray(0.5, dtype)

    def f(y):
        for i in range(k):
            y = jax.lax.optimization_barrier(y * (c2 if i % 2 == 0 else ch))
        return y

    c = jax.jit(f).lower(x).compile()
    t = _time_call(c, x) - oh
    return 2.0 * k * n * np.dtype(dtype).itemsize / t / 1e9


def vpu_chain(k=2048, n=64 * 1024 * 1024, dtype=jnp.float32, oh=0.0):
    x = jnp.full((n,), 0.5, dtype)
    c025 = jnp.asarray(0.25, dtype)

    def f(y):
        for _ in range(k):
            y = y * y + c025  # fixed point 0.5; not algebraically foldable
        return y

    c = jax.jit(f).lower(x).compile()
    t = _time_call(c, x) - oh
    return 2.0 * k * n / t / 1e9  # mul+add per iteration


def trans_chain(k=512, n=32 * 1024 * 1024, dtype=jnp.float32, oh=0.0):
    x = jnp.full((n,), 0.5, dtype)

    def f(y):
        for _ in range(k):
            y = jnp.exp(-y)  # fixed point ~0.567
        return y

    c = jax.jit(f).lower(x).compile()
    t = _time_call(c, x) - oh
    return k * n / t / 1e9


def mxu(m=8192, steps=64, dtype=jnp.bfloat16, oh=0.0):
    a = jnp.full((m, m), 0.01, dtype)
    b = jnp.eye(m, dtype=dtype)

    def f(a, b):
        # dependent chain of k matmuls (b = identity keeps values stable);
        # barriers stop XLA from simplifying the chain
        for _ in range(steps):
            a = jax.lax.optimization_barrier(
                jnp.dot(a, b, preferred_element_type=jnp.float32).astype(dtype)
            )
        return a

    c = jax.jit(f).lower(a, b).compile()
    t = _time_call(c, a, b) - oh
    return 2.0 * steps * m * m * m / t / 1e12


def main():
    dev = jax.devices()[0]
    oh = _overhead()
    out = {
        "platform": dev.platform,
        "device_kind": getattr(dev, "device_kind", "unknown"),
        "sync_overhead_ms": round(oh * 1e3, 2),
        "hbm_gbps_bf16": round(hbm_stream(dtype=jnp.bfloat16, oh=oh), 1),
        "hbm_gbps_f32": round(hbm_stream(dtype=jnp.float32, oh=oh), 1),
        "vpu_gops_f32": round(vpu_chain(dtype=jnp.float32, oh=oh), 1),
        "vpu_gops_bf16": round(vpu_chain(dtype=jnp.bfloat16, oh=oh), 1),
        "trans_exp_gops_f32": round(trans_chain(dtype=jnp.float32, oh=oh), 1),
        "mxu_tflops_bf16": round(mxu(oh=oh), 1),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
