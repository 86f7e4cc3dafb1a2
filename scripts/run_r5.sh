#!/bin/bash
# Round-5 artifact queue.  Serial TPU runs, health-gated for the flaky
# single-chip relay, with the r4 process fix (VERDICT r4 item 5):
#
#   * BENCH FRESHNESS PREEMPTS LONG PHASES.  Before every step, if the
#     last bench partial is stale (>90 min) or not TPU-provenance, a
#     5-10 min bench.py refresh runs FIRST — so the driver's end-of-round
#     capture always has a recent TPU artifact to fall back on.
#   * Wait loops ABORT their dependent steps on timeout instead of
#     falling through (ADVICE r4 low item: run_r4b launched scale_train
#     on an unfinished prep).
#
# Usage: bash scripts/run_r5.sh [step ...]
set -u
cd "$(dirname "$0")/.."

log() { echo "[r5 $(date +%H:%M:%S)] $*"; }

# Probe with a LONG timeout and LONG rest: a probe killed mid-init
# abandons a half-open relay connection and re-wedges the tunnel — the
# 60s-probe/300s-rest loop could keep the relay wedged indefinitely
# (observed: heal at 10:16, one client served, wedged again within 4
# minutes of the next short probe).
probe() {
  timeout 420 python -c \
    "import jax,numpy as np,jax.numpy as jnp; float(np.asarray(jnp.ones(2).sum()))" \
    >/dev/null 2>&1
}

wait_healthy() {
  local i
  for i in $(seq 1 12); do
    if probe; then log "tunnel healthy"; return 0; fi
    log "tunnel wedged; resting 600s (attempt $i/12)"
    sleep 600
  done
  return 1
}

bench_fresh() {
  # fresh = BENCH_partial.json exists, is TPU-provenance, and < 90 min old
  python - <<'EOF'
import json, os, sys, time
p = 'runs/BENCH_partial.json'
try:
    d = json.load(open(p))
    ok = d.get('platform') == 'tpu' and time.time() - os.path.getmtime(p) < 5400
except Exception:
    ok = False
sys.exit(0 if ok else 1)
EOF
}

maybe_bench() {
  if bench_fresh; then return 0; fi
  log "bench stale/non-TPU -> refreshing first"
  timeout 1800 python bench.py > runs/bench_r5_auto.log 2>&1
  local rc=$?
  log "bench refresh rc=$rc: $(tail -c 200 runs/bench_r5_auto.log | tr '\n' ' ')"
  sleep 30
}

run() {
  local name=$1 to=$2; shift 2
  wait_healthy || { log "SKIP $name (tunnel never healed)"; return 1; }
  [ "$name" != "${name#bench}" ] || maybe_bench
  log "START $name"
  timeout "$to" "$@" > "runs/${name}.log" 2>&1
  local rc=$?
  log "END $name rc=$rc"
  tail -c 300 "runs/${name}.log" | tr '\n' ' '
  echo
  sleep 30
  return $rc
}

# Optional: wait for an in-flight quality run (pid in $WAIT_PID) to finish
if [ -n "${WAIT_PID:-}" ]; then
  log "waiting for pid $WAIT_PID to exit"
  waited=0
  while [ -d "/proc/$WAIT_PID" ] && [ "$waited" -lt 7200 ]; do
    sleep 60; waited=$((waited + 60))
  done
  if [ -d "/proc/$WAIT_PID" ]; then
    log "pid $WAIT_PID still alive after ${waited}s; proceeding anyway"
  else
    log "pid $WAIT_PID exited after ${waited}s"
  fi
fi

steps=${*:-bench hier_tune step_overhead scale_eval polymers_full hier_hopv_test ft_sweep bench_final}
for s in $steps; do
  case $s in
    bench)
      run bench_r5 1800 python bench.py ;;
    bench_final)
      run bench_r5_final 1800 python bench.py ;;
    hier_tune)
      # warm-propose timing at the old vs new table budgets + a trace
      run hier_tune_old 1200 python scripts/hier_propose_tpu.py \
        --a-budget 512 --eg-budget 640 --nbg-budget 10 \
        --out runs/HIER_PROPOSE_old.json
      run hier_tune_new 1200 python scripts/hier_propose_tpu.py \
        --out runs/HIER_PROPOSE_new.json --trace runs/hier_trace ;;
    step_overhead)
      run step_overhead 2400 python scripts/step_overhead.py \
        --time --batch 240 ;;
    scale_eval)
      run scale_eval 5400 python scripts/scale_run.py --eval ;;
    polymers_full)
      if [ -f runs/QUALITY_polymers_test.json.ckpt ]; then
        run polymers_full_tpu 9000 python scripts/quality_run.py \
          --data data/polymers/valid.txt --limit 5000 \
          --min-freq 40 --epochs 0 --ft-epochs 0 \
          --load-ckpt runs/QUALITY_polymers_test.json.ckpt \
          --eval-data data/polymers/test.txt --eval-limit 0 \
          --out runs/QUALITY_polymers_test_full.json
      else
        log "SKIP polymers_full (no ckpt from polymers_test run)"
      fi ;;
    hier_hopv_test)
      run hier_hopv_test 9000 python scripts/quality_run.py \
        --data data/hopv15.csv --model hier-prop \
        --holdout 50 --epochs 200 --ft-epochs 0 \
        --out runs/QUALITY_hier_hopv_test.json ;;
    ft_sweep)
      run ft_sweep_r5 10800 python scripts/ft_sweep.py --ft-epochs 150 ;;
    mfu)
      run mfu_r5 2400 python scripts/mfu_bench.py --seconds 8 ;;
    *) log "unknown step $s" ;;
  esac
done
log "r5 queue: all requested steps attempted"
