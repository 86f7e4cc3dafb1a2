#!/bin/bash
# Round-4 final queue: waits for run_r4b.sh to finish, then runs the fixed
# eV-protocol fine-tune sweep and a final bench refresh.
set -u
cd "$(dirname "$0")/.."

log() { echo "[r4c $(date +%H:%M:%S)] $*"; }

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

for i in $(seq 1 360); do
  if grep -q 'all requested steps attempted' runs/r4b_queue.log 2>/dev/null; then
    log "r4b finished"; break
  fi
  sleep 30
done

steps=${*:-ft_sweep bench}
for s in $steps; do
  case $s in
    ft_sweep)
      run ft_sweep2 7200 python scripts/ft_sweep.py --ft-epochs 150 ;;
    bench)
      run bench_r4_final 1800 python bench.py ;;
    *) log "unknown step $s" ;;
  esac
done
log "r4c done"
