#!/bin/bash
# Serial TPU artifact runs, health-gated for the flaky single-chip relay.
#
# The relay (a single multiplexed stdio tunnel) wedges under sustained
# dispatch load and heals after idle; each run below is preceded by a
# health probe loop so a wedged tunnel costs rest time, not a hung run.
#
# Usage: bash scripts/run_artifacts.sh [step ...]   (default: all steps)
set -u
cd "$(dirname "$0")/.."

log() { echo "[artifacts $(date +%H:%M:%S)] $*"; }

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
  tail -c 400 "runs/${name}.log" | tr '\n' ' ' | tail -c 200
  echo
  # post-run settle so the next client starts on a calm relay
  sleep 60
  return $rc
}

steps=${*:-bench mfu hopv_test curated_test optimize_curated_soft optimize_curated_patience optimize_curated_hard parity}

for s in $steps; do
  case $s in
    bench)
      run bench_r3 900 python bench.py ;;
    mfu)
      run mfu 2400 python scripts/mfu_bench.py --seconds 8 ;;
    hopv_test)
      run hopv_test 5400 python scripts/quality_run.py \
        --data data/hopv15.csv --holdout 50 \
        --out runs/QUALITY_hopv_test.json \
        --dump-recon runs/recon_hopv_test.csv ;;
    curated_test)
      run curated_test 5400 python scripts/quality_run.py \
        --data data/chem_data/cleaned_data.csv \
        --holdout 12 --min-freq 2 --hidden 400 --latent 48 \
        --out runs/QUALITY_curated_test.json \
        --dump-recon runs/recon_curated_test.csv ;;
    optimize_curated_soft|optimize_curated_patience|optimize_curated_hard)
      pol=${s##*_}
      run "optimize_curated_${pol}" 3600 python scripts/optimize_run.py \
        --data data/chem_data/cleaned_data.csv \
        --vocab runs/QUALITY_curated_r2.json.vocab.txt \
        --ckpt runs/QUALITY_curated_r2.json.ckpt \
        --hidden 400 --latent 48 --policy "$pol" \
        --out "runs/OPTIMIZE_curated_${pol}.json" ;;
    polymers_test)
      run polymers_test 10800 python scripts/quality_run.py \
        --data data/polymers/valid.txt --limit 5000 \
        --min-freq 40 --epochs 60 --ft-epochs 0 \
        --eval-data data/polymers/test.txt \
        --out runs/QUALITY_polymers_test.json ;;
    hier_hopv_test)
      run hier_hopv_test 7200 python scripts/quality_run.py \
        --data data/hopv15.csv --model hier-prop \
        --holdout 50 --epochs 200 --ft-epochs 0 \
        --out runs/QUALITY_hier_hopv_test.json ;;
    parity)
      run parity 1200 bash -c '
        python scripts/parity_harness.py reference &&
        python scripts/parity_harness.py ours \
          --recon-csv runs/recon_curated_r2.csv \
          --optimize-json runs/OPTIMIZE_curated_soft.json \
            runs/OPTIMIZE_curated_patience.json \
            runs/OPTIMIZE_curated_hard.json &&
        python scripts/parity_harness.py report' ;;
    *) log "unknown step $s" ;;
  esac
done
log "all requested steps attempted"
