#!/bin/bash
# Round-5 follow-on queue: runs after the relaunched main queue (r5d,
# logging to runs/r5d_queue.log) finishes.  Measures the propose-scan
# state-traffic optimization on TPU, retries the step-overhead
# decomposition that died on a backend error, refreshes MFU (plus the
# flat-optimizer A/B), and ends with a final bench so the driver's
# end-of-round capture sees the optimized decode paths.
set -u
cd "$(dirname "$0")/.."

log() { echo "[r5e $(date +%H:%M:%S)] $*"; }

# LONG probe + LONG rest (a probe killed mid-init re-wedges the relay)
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
until grep -q 'r5 queue: all requested steps attempted' runs/r5d_queue.log 2>/dev/null; do
  sleep 60; waited=$((waited + 60))
  if [ "$waited" -ge 28800 ]; then
    log "r5d never finished after ${waited}s; aborting r5e"
    exit 1
  fi
done
log "r5d finished (waited ${waited}s)"

steps=${*:-ft_sweep_retry hier_meas motif_meas step_overhead_retry mfu mfu_flat bench_final2}
for s in $steps; do
  case $s in
    motif_meas)
      run motif_meas 1500 python scripts/motif_propose_tpu.py \
        --out runs/MOTIF_PROPOSE_TPU.json --trace runs/motif_trace ;;
    ft_sweep_retry)
      # the donated-buffer fix: protocols 2+ no longer reuse deleted
      # pretrain arrays; reuses the unchanged-pretrain cache if present
      run ft_sweep_retry 10800 python scripts/ft_sweep.py --ft-epochs 150 --skip-pretrain ;;
    hier_meas)
      run hier_meas 1200 python scripts/hier_propose_tpu.py \
        --out runs/HIER_PROPOSE_opt.json --trace runs/hier_trace_opt ;;
    step_overhead_retry)
      run step_overhead_retry 2400 python scripts/step_overhead.py \
        --time --batch 240 ;;
    mfu)
      run mfu_r5 2400 python scripts/mfu_bench.py --seconds 8 ;;
    mfu_flat)
      run mfu_r5_flat 2400 python scripts/mfu_bench.py --seconds 8 \
        --flatten --out runs/MFU_flat.json ;;
    bench_final2)
      run bench_r5_final2 1800 python bench.py ;;
    *) log "unknown step $s" ;;
  esac
done
log "r5e queue: all requested steps attempted"
