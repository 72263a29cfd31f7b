#!/usr/bin/env bash
# SUPERSEDED (kept for the record): the battery RAN in round 5 — results in
# docs/PERF.md §14.1-14.5 and docs/baselines/ab_r5_*.json.  Note arm 2's
# BENCH_XLA_OPT double-buffering option does NOT EXIST in this backend's
# compiler (§14.3, probe: scripts/probe_compiler_options.py) — running this
# script verbatim will loop on that arm forever.
#
# Round-5 lever A/B battery (docs/PERF.md §13.3): capture, over a FLICKERING
# tunneled backend (TRAINING.md post-mortem; r5 observed 90s-probe-ok
# followed by 240s-probe-hang minutes later),
#   1. BENCH_PACK_GEMMS=1   — narrow-GEMM row folding (ops/gemm_pack.py)
#   2. BENCH_XLA_OPT=...    — while-loop double buffering vs the copy-done share
#   3. default              — fresh headline capture for comparison
# Strategy: loop until EVERY capture holds a real (value > 0) artifact;
# probe before each attempt; one TPU client at a time (bench runs with
# BENCH_PROBE=0 because we just probed — a second concurrent client is a
# wedge trigger); sleep out wedges between attempts.  Results land in
# /tmp/ab_r5_*.json (one JSON line each); copy good ones to docs/baselines/.
set -u
cd "$(dirname "$0")/.."

probe() {
  timeout 120 python -c "import jax, jax.numpy as jnp; print(float(jnp.arange(8.).sum()))" >/dev/null 2>&1
}

# capture <name> <env...> — run bench.py under env, keep artifact iff value>0
capture() {
  local name="$1"; shift
  env "$@" timeout 1700 python bench.py \
    > "/tmp/ab_r5_${name}.json.try" 2>"/tmp/ab_r5_${name}.log"
  if python - "$name" <<'EOF'
import json, sys
try:
    d = json.load(open(f"/tmp/ab_r5_{sys.argv[1]}.json.try"))
    sys.exit(0 if d.get("value", 0) > 0 else 1)
except Exception:
    sys.exit(1)
EOF
  then
    mv "/tmp/ab_r5_${name}.json.try" "/tmp/ab_r5_${name}.json"
    echo "ab_round5: ${name} CAPTURED" >&2
    return 0
  fi
  echo "ab_round5: ${name} failed (watchdog/wedge) — will retry" >&2
  return 1
}

done_p() { [ -s "/tmp/ab_r5_$1.json" ] && python - "$1" <<'EOF'
import json, sys
try:
    d = json.load(open(f"/tmp/ab_r5_{sys.argv[1]}.json"))
    sys.exit(0 if d.get("value", 0) > 0 else 1)
except Exception:
    sys.exit(1)
EOF
}

deadline=$(( $(date +%s) + ${AB_MAX_S:-28800} ))   # default: keep trying 8 h
while [ "$(date +%s)" -lt "$deadline" ]; do
  all=1
  for name in pack xladb default; do
    done_p "$name" && continue
    all=0
    if ! probe; then
      echo "ab_round5: backend wedged before ${name} — sleeping 300s" >&2
      sleep 300
      continue
    fi
    case "$name" in
      pack)    capture pack BENCH_ALLOW_AB=1 BENCH_PROBE=0 BENCH_PACK_GEMMS=1 ;;
      xladb)   capture xladb BENCH_ALLOW_AB=1 BENCH_PROBE=0 \
                 BENCH_XLA_OPT=xla_tpu_enable_while_loop_double_buffering=true ;;
      default) capture default BENCH_PROBE=0 ;;
    esac
    sleep 30   # let the tunnel settle between clients
  done
  [ "$all" = 1 ] && { echo "ab_round5: ALL CAPTURED" >&2; exit 0; }
done
echo "ab_round5: deadline hit with captures incomplete" >&2
exit 3
