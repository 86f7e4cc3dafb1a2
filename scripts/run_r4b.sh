#!/bin/bash
# Round-4 continuation queue: waits for the fused 100k prep to finish, then
# runs the TPU phases serially (same health-gate as run_r4.sh).
set -u
cd "$(dirname "$0")/.."

log() { echo "[r4b $(date +%H:%M:%S)] $*"; }

probe() {
  timeout 60 python -c \
    "import jax,numpy as np,jax.numpy as jnp; float(np.asarray(jnp.ones(2).sum()))" \
    >/dev/null 2>&1
}

wait_healthy() {
  local i
  for i in $(seq 1 24); do
    if probe; then log "tunnel healthy"; return 0; fi
    log "tunnel wedged; resting 300s (attempt $i/24)"
    sleep 300
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

# 1. wait for the fused prep chain (writes "pass C: ..." as its last line)
for i in $(seq 1 240); do
  if grep -q 'pass C:.*shards' runs/scale_prep_fused.log 2>/dev/null; then
    log "prep finished"; break
  fi
  sleep 30
done

steps=${*:-scale_train scale_eval polymers polymers_full}
for s in $steps; do
  case $s in
    scale_train)
      run scale_train 7200 python scripts/scale_run.py --train ;;
    scale_eval)
      run scale_eval 3600 python scripts/scale_run.py --eval ;;
    polymers)
      run polymers_test_tpu 7200 python scripts/quality_run.py \
        --data data/polymers/valid.txt --limit 5000 \
        --min-freq 40 --epochs 60 --ft-epochs 0 \
        --eval-data data/polymers/test.txt \
        --out runs/QUALITY_polymers_test.json ;;
    polymers_full)
      run polymers_full_tpu 7200 python scripts/quality_run.py \
        --data data/polymers/valid.txt --limit 5000 \
        --min-freq 40 --epochs 0 --ft-epochs 0 \
        --load-ckpt runs/QUALITY_polymers_test.json.ckpt \
        --eval-data data/polymers/test.txt --eval-limit 0 \
        --out runs/QUALITY_polymers_test_full.json ;;
    *) log "unknown step $s" ;;
  esac
done
log "all requested steps attempted"
