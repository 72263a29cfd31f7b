#!/usr/bin/env bash
# Round-5 lever A/B battery (docs/PERF.md §13.3): waits for the tunneled TPU
# backend to come back from a wedge (TRAINING.md post-mortem), then captures
#   1. BENCH_PACK_GEMMS=1   — narrow-GEMM row folding (ops/gemm_pack.py)
#   2. BENCH_XLA_OPT=...    — while-loop double buffering vs the copy-done share
#   3. default              — fresh headline capture for comparison
# One TPU client at a time; each bench self-guards with its own watchdogs.
# Results land in /tmp/ab_r5_*.json (one JSON line each).
set -u
cd "$(dirname "$0")/.."

probe() {
  timeout 90 python -c "import jax, jax.numpy as jnp; print(float(jnp.arange(8.).sum()))" >/dev/null 2>&1
}

tries=0
until probe; do
  tries=$((tries + 1))
  echo "ab_round5: backend wedged (probe $tries) — sleeping 600s" >&2
  if [ "$tries" -ge 12 ]; then
    echo "ab_round5: giving up after $tries probes" >&2
    exit 1
  fi
  sleep 600
done
echo "ab_round5: backend alive after $tries wedged probes — running battery" >&2

BENCH_ALLOW_AB=1 BENCH_PACK_GEMMS=1 timeout 1600 python bench.py \
  > /tmp/ab_r5_pack.json 2>/tmp/ab_r5_pack.log
echo "ab_round5: pack done rc=$?" >&2

probe || { echo "ab_round5: wedged after pack run" >&2; exit 2; }

BENCH_ALLOW_AB=1 BENCH_XLA_OPT=xla_tpu_enable_while_loop_double_buffering=true \
  timeout 1600 python bench.py > /tmp/ab_r5_xladb.json 2>/tmp/ab_r5_xladb.log
echo "ab_round5: xla-db done rc=$?" >&2

probe || { echo "ab_round5: wedged after xla-db run" >&2; exit 2; }

timeout 1600 python bench.py > /tmp/ab_r5_default.json 2>/tmp/ab_r5_default.log
echo "ab_round5: default done rc=$?" >&2
