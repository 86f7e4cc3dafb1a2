#!/bin/bash
# Serial CPU-backend artifact regeneration — for relay outages.
#
# Round-3 observed a relay wedge with nothing listening on the loopback
# port: that variant never self-heals, so TPU-gated artifacts
# (scripts/run_artifacts.sh) can starve a whole round.  This queue runs
# the same steps with JAX_PLATFORMS=cpu (ggpm_tpu/__init__.py mirrors the
# env var into the jax config, bypassing the axon plugin's forced init).
# Artifacts carry a "platform" key so provenance is explicit; if the
# relay heals, the TPU queue regenerates them at full fidelity.
#
# Usage: bash scripts/run_artifacts_cpu.sh [wait_pid] [step ...]
set -u
cd "$(dirname "$0")/.."
export JAX_PLATFORMS=cpu

log() { echo "[artifacts-cpu $(date +%H:%M:%S)] $*"; }

if [[ $# -ge 1 && $1 =~ ^[0-9]+$ ]]; then
  wait_pid=$1; shift
  log "waiting for pid $wait_pid to exit"
  while [ -d "/proc/$wait_pid" ]; do sleep 60; done
fi

run() {
  local name=$1 to=$2; shift 2
  log "START $name"
  timeout "$to" "$@" > "runs/${name}_cpu.log" 2>&1
  local rc=$?
  log "END $name rc=$rc"
  tail -c 300 "runs/${name}_cpu.log" | tr '\n' ' ' | tail -c 200
  echo
  return $rc
}

steps=${*:-hopv_test polymers_test turbo_motif turbo_hier pytest}

for s in $steps; do
  case $s in
    hopv_test)
      run hopv_test 28800 python scripts/quality_run.py \
        --data data/hopv15.csv --holdout 50 \
        --out runs/QUALITY_hopv_test.json \
        --dump-recon runs/recon_hopv_test.csv ;;
    polymers_test)
      # CPU-feasible variant of the TPU step: 30 epochs (same optimizer
      # -step count as the HOPV protocol at 250 batches/epoch) and a
      # 1000-mol eval slice of the untouched test.txt (enum-root 2)
      run polymers_test 28800 python scripts/quality_run.py \
        --data data/polymers/valid.txt --limit 5000 \
        --min-freq 40 --epochs 30 --ft-epochs 0 \
        --eval-data data/polymers/test.txt \
        --eval-limit 1000 --enum-root 2 \
        --out runs/QUALITY_polymers_test.json ;;
    turbo_motif)
      run turbo_motif 3600 python scripts/turbo_profile.py --n 120 ;;
    turbo_hier)
      run turbo_hier 7200 python scripts/turbo_profile.py \
        --model hier-prop --ckpt runs/QUALITY_hier_hopv.json.ckpt \
        --vocab runs/QUALITY_hier_hopv.json.vocab.txt --n 120 ;;
    pytest)
      run pytest 7200 python -m pytest tests/ -q ;;
    *) log "unknown step $s" ;;
  esac
done
log "queue drained"
