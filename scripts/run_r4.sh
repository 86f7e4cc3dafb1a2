#!/bin/bash
# Round-4 serial TPU queue (same health-gated pattern as run_artifacts.sh).
#
# Steps, in order of value-per-minute:
#   bench      items 2+3: motif decode re-measure + first hier TPU number
#   chemberta  item 9: baseline MAE artifact
#   ft_sweep   item 5: EW/TD/IO protocol sweep on curated-OPV
#   scale_gen  item 4: build the >=100k corpus from the trained prior (TPU)
#   scale_prep item 4: host tensorize+shard (6k-motif vocab)
#   scale_train item 4: 3-epoch pretrain at 100k+ mols, loss curve + sigs
#   scale_eval item 4: holdout recon + prior-sample metrics
#   polymers   item 6: regenerate the last CPU-provenance artifacts on TPU
#
# Usage: bash scripts/run_r4.sh [step ...]   (default: all)
set -u
cd "$(dirname "$0")/.."

log() { echo "[r4 $(date +%H:%M:%S)] $*"; }

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
  sleep 60
  return $rc
}

steps=${*:-bench chemberta ft_sweep scale_gen scale_prep scale_train scale_eval polymers polymers_full}

for s in $steps; do
  case $s in
    bench)
      run bench_r4 1800 python bench.py ;;
    chemberta)
      run chemberta 3600 python scripts/chemberta_baseline.py ;;
    ft_sweep)
      run ft_sweep 10800 python scripts/ft_sweep.py ;;
    scale_gen)
      run scale_gen 10800 python scripts/scale_run.py --gen ;;
    scale_prep)
      # host-only: no TPU client, no health gate needed
      log "START scale_prep (host)"
      JAX_PLATFORMS=cpu timeout 7200 python scripts/scale_run.py --prep \
        > runs/scale_prep.log 2>&1
      log "END scale_prep rc=$?" ;;
    scale_train)
      run scale_train 14400 python scripts/scale_run.py --train ;;
    scale_eval)
      run scale_eval 3600 python scripts/scale_run.py --eval ;;
    polymers)
      run polymers_test_tpu 10800 python scripts/quality_run.py \
        --data data/polymers/valid.txt --limit 5000 \
        --min-freq 40 --epochs 60 --ft-epochs 0 \
        --eval-data data/polymers/test.txt \
        --out runs/QUALITY_polymers_test.json ;;
    polymers_full)
      run polymers_full_tpu 10800 python scripts/quality_run.py \
        --data data/polymers/valid.txt --limit 5000 \
        --min-freq 40 --epochs 0 --ft-epochs 0 \
        --load-ckpt runs/QUALITY_polymers_test.json.ckpt \
        --eval-data data/polymers/test.txt --eval-limit 0 \
        --out runs/QUALITY_polymers_test_full.json ;;
    *) log "unknown step $s" ;;
  esac
done
log "all requested steps attempted"
