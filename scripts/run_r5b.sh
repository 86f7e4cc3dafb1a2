#!/bin/bash
# Round-5 follow-on queue: waits for run_r5.sh to finish, then regenerates
# the polymers quality artifacts with a fresh TPU training run (the round-4
# attempt lost its model to an external timeout during the then-quadratic
# metrics phase — both the metrics and the early-checkpoint fix are in).
set -u
cd "$(dirname "$0")/.."

log() { echo "[r5b $(date +%H:%M:%S)] $*"; }

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

run() {
  local name=$1 to=$2; shift 2
  wait_healthy || { log "SKIP $name (tunnel never healed)"; return 1; }
  log "START $name"
  timeout "$to" "$@" > "runs/${name}.log" 2>&1
  local rc=$?
  log "END $name rc=$rc"
  tail -c 300 "runs/${name}.log" | tr '\n' ' '
  echo
  sleep 30
  return $rc
}

# wait for r5's completion marker; abort dependents on timeout (never
# fall through onto a busy TPU)
waited=0
until grep -q 'r5 queue: all requested steps attempted' runs/r5_queue.log 2>/dev/null; do
  sleep 60; waited=$((waited + 60))
  if [ "$waited" -ge 28800 ]; then
    log "r5 queue never finished after ${waited}s; aborting r5b"
    exit 1
  fi
done
log "r5 queue finished (waited ${waited}s)"

steps=${*:-polymers_test polymers_full bench_final2}
for s in $steps; do
  case $s in
    polymers_test)
      run polymers_test_tpu 9000 python scripts/quality_run.py \
        --data data/polymers/valid.txt --limit 5000 \
        --min-freq 40 --epochs 60 --ft-epochs 0 \
        --eval-data data/polymers/test.txt --eval-limit 1000 \
        --out runs/QUALITY_polymers_test.json ;;
    polymers_full)
      if [ -f runs/QUALITY_polymers_test.json.ckpt ]; then
        run polymers_full_tpu 9000 python scripts/quality_run.py \
          --data data/polymers/valid.txt --limit 5000 \
          --min-freq 40 --epochs 0 --ft-epochs 0 \
          --load-ckpt runs/QUALITY_polymers_test.json.ckpt \
          --eval-data data/polymers/test.txt --eval-limit 0 \
          --out runs/QUALITY_polymers_test_full.json
      else
        log "SKIP polymers_full (no ckpt)"
      fi ;;
    bench_final2)
      run bench_r5_final2 1800 python bench.py ;;
    *) log "unknown step $s" ;;
  esac
done
log "r5b queue: all requested steps attempted"
