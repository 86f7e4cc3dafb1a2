#!/bin/bash
# Round-5 stage 3: corrected-amortization MFU refresh, flat-optimizer A/B,
# and the extended 100k-scale training (resume from the 3-epoch ckpt).
set -u
cd "$(dirname "$0")/.."

log() { echo "[r5c $(date +%H:%M:%S)] $*"; }

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

waited=0
until grep -q 'r5b queue: all requested steps attempted' runs/r5b_queue.log 2>/dev/null; do
  sleep 60; waited=$((waited + 60))
  if [ "$waited" -ge 36000 ]; then
    log "r5b never finished after ${waited}s; aborting r5c"
    exit 1
  fi
done
log "r5b finished (waited ${waited}s)"

steps=${*:-mfu_refresh mfu_flat scale_train_more scale_eval_refresh bench_final3}
for s in $steps; do
  case $s in
    mfu_refresh)
      run mfu_r5 2400 python scripts/mfu_bench.py --seconds 8 ;;
    mfu_flat)
      run mfu_r5_flat 2400 python scripts/mfu_bench.py --seconds 8 \
        --flatten --out runs/MFU_flat.json ;;
    scale_train_more)
      run scale_train_more 5400 python scripts/scale_run.py \
        --train --resume --epochs 7 ;;
    scale_eval_refresh)
      run scale_eval_refresh 5400 python scripts/scale_run.py --eval ;;
    bench_final3)
      run bench_r5_final3 1800 python bench.py ;;
    *) log "unknown step $s" ;;
  esac
done
log "r5c queue: all requested steps attempted"
