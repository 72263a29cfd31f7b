#!/usr/bin/env bash
# Round-5 TPU work queue — runs AFTER scripts/ab_round5.sh has all three
# captures, in cheap-first order (VERDICT r4 weak #2: schedule the valuable
# captures ahead of wedge-inducing long traffic):
#   1. BENCH_MIN_CH=8 capture          (~6 min;  VERDICT next #5)
#   2. step re-profile + op_profile    (~10 min; VERDICT next #2)
#   3. DRD composition-freeze A/B arms (~25 min each; VERDICT next #4)
#   4. third ref10k seed (2024)        (~45-60 min; VERDICT next #3)
# Every job is probe-guarded and retried; training jobs auto-resume from
# their checkpoints on re-run.  One TPU client at a time.
set -u
cd "$(dirname "$0")/.."

probe() {
  timeout 120 python -c "import jax, jax.numpy as jnp; print(float(jnp.arange(8.).sum()))" >/dev/null 2>&1
}

good_json() {
  python - "$1" <<'EOF'
import json, sys
try:
    d = json.load(open(sys.argv[1]))
    sys.exit(0 if d.get("value", 0) > 0 else 1)
except Exception:
    sys.exit(1)
EOF
}

deadline=$(( $(date +%s) + ${Q_MAX_S:-30000} ))
alive() { [ "$(date +%s)" -lt "$deadline" ]; }

# ---- 0. wait for the battery to finish (it owns the TPU until then) --------
echo "queue: waiting for ab_round5 captures" >&2
while alive; do
  ok=1
  for n in pack xladb default; do
    { [ -s "/tmp/ab_r5_$n.json" ] && good_json "/tmp/ab_r5_$n.json"; } || ok=0
  done
  [ "$ok" = 1 ] && break
  sleep 180
done
echo "queue: battery done (or deadline) — starting jobs" >&2

# ---- 1. BENCH_MIN_CH=8 capture ---------------------------------------------
while alive && ! { [ -s /tmp/ab_r5_minch8.json ] && good_json /tmp/ab_r5_minch8.json; }; do
  if ! probe; then echo "queue: wedged before minch8 — 300s" >&2; sleep 300; continue; fi
  BENCH_ALLOW_AB=1 BENCH_PROBE=0 BENCH_MIN_CH=8 timeout 1700 python bench.py \
    > /tmp/ab_r5_minch8.json.try 2>/tmp/ab_r5_minch8.log
  if good_json /tmp/ab_r5_minch8.json.try; then
    mv /tmp/ab_r5_minch8.json.try /tmp/ab_r5_minch8.json
    echo "queue: minch8 CAPTURED" >&2
  else
    echo "queue: minch8 failed — retry" >&2; sleep 60
  fi
done

# ---- 2. re-profile the shipped step ----------------------------------------
while alive && [ ! -s /tmp/op_profile_r5.json ]; do
  if ! probe; then echo "queue: wedged before profile — 300s" >&2; sleep 300; continue; fi
  rm -rf /tmp/jaxprof
  PROF_N=512 PROF_K=6 PROF_PRNG=rbg_full timeout 1700 python scripts/profile_step.py \
    > /tmp/profile_r5.log 2>&1
  timeout 600 python -c "
from xprof.convert import raw_to_tool_data as r; import glob
d,_=r.xspace_to_tool_data(glob.glob('/tmp/jaxprof/plugins/profile/*/*.xplane.pb'),'op_profile',{})
open('/tmp/op_profile_r5.json','w').write(d if isinstance(d,str) else d.decode())
" >> /tmp/profile_r5.log 2>&1 || { echo "queue: profile convert failed — retry" >&2; sleep 60; continue; }
  [ -s /tmp/op_profile_r5.json ] && echo "queue: profile CAPTURED" >&2
done

# ---- 3. DRD composition-freeze A/B arms (vs existing host-fed arms) --------
drd_arm() {  # $1 = seed
  local seed="$1" log="runs/long128-rbgfull-s${seed}-drd"
  while alive; do
    # finished iff demo_train printed its final TEST: line for this log dir
    [ -s "/tmp/drd_${seed}.log" ] && grep -q '^TEST:' "/tmp/drd_${seed}.log" && return 0
    if ! probe; then echo "queue: wedged before drd s${seed} — 300s" >&2; sleep 300; continue; fi
    timeout 4000 python scripts/demo_train.py \
      --buildings 2048 --epochs 700 --grid-batch 128 --root /tmp/bgt_demo \
      --device-resident --ckpt-latest-interval 25 --seed "${seed}" \
      --log-dir "${log}" >> "/tmp/drd_${seed}.log" 2>&1
    grep -q '^TEST:' "/tmp/drd_${seed}.log" && { echo "queue: drd s${seed} DONE" >&2; return 0; }
    echo "queue: drd s${seed} interrupted — resuming" >&2
    sleep 60
  done
}
drd_arm 777
drd_arm 1234

# ---- 4. third ref10k seed --------------------------------------------------
while alive; do
  [ -s /tmp/ref10k_2024.log ] && grep -q '^TEST:' /tmp/ref10k_2024.log && break
  if ! probe; then echo "queue: wedged before ref10k s2024 — 300s" >&2; sleep 300; continue; fi
  timeout 7200 python scripts/demo_train.py \
    --buildings 10000 --epochs 1000 --grid-batch 512 --root /tmp/bgt_ref10k \
    --device-resident --ckpt-latest-interval 25 --seed 2024 \
    --log-dir runs/ref10k-rbgfull-seed2024 >> /tmp/ref10k_2024.log 2>&1
  grep -q '^TEST:' /tmp/ref10k_2024.log && { echo "queue: ref10k s2024 DONE" >&2; break; }
  echo "queue: ref10k s2024 interrupted — resuming" >&2
  sleep 60
done

echo "queue: all jobs done (or deadline hit)" >&2
