#!/bin/bash
# Round-5 TPU work queue v2: probes the tunnel before EVERY step and
# retries each step up to 3 times across outages.
set -u
LOG=/tmp/hw_queue_r05.log
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo

log() { echo "[$(date +%H:%M:%S)] $*" >> "$LOG"; }

probe() {  # block until the tunnel answers a trivial program
  for i in $(seq 1 600); do
    if timeout 90 python - <<'EOF' >/dev/null 2>&1
import jax, jax.numpy as jnp, numpy as np
np.asarray(jax.jit(lambda a: a*2+1)(jnp.ones(8)))
EOF
    then log "tunnel up (probe $i)"; return 0; fi
    sleep 45
  done
  return 1
}

step() {  # step <name> <timeout> <cmd...>
  local name=$1 to=$2; shift 2
  for attempt in 1 2 3; do
    probe || { log "$name: tunnel never came back"; return 1; }
    log "=== $name (attempt $attempt) ==="
    timeout "$to" "$@" >> "$LOG" 2>&1
    local rc=$?
    log "$name rc=$rc"
    [ $rc -eq 0 ] && return 0
  done
  return 1
}

step "1. fused-QMC long-horizon drive" 3600 python parity/qmc_long_drive.py

bench_step() {  # bench_step <label> <outfile> [env...]
  local label=$1 out=$2; shift 2
  for attempt in 1 2 3; do
    probe || return 1
    log "=== bench $label (attempt $attempt) ==="
    env "$@" timeout 2400 python bench.py > "$out" 2>>"$LOG"
    local rc=$?
    log "bench $label rc=$rc"
    if [ $rc -eq 0 ]; then tail -1 "$out" >> "$LOG"; return 0; fi
  done
  return 1
}

bench_step baseline /tmp/bench_r05_base.json X=1
bench_step interleave2-chained /tmp/bench_r05_il2.json BENCH_INTERLEAVE=2
bench_step staggered /tmp/bench_r05_stag.json BENCH_INTERLEAVE=2 BENCH_SCHEDULE=staggered

# interpret-mode tests are excluded on TPU: pallas interpret lowers to
# per-grid-step io_callbacks — each a ~25 ms tunnel round-trip, so one
# kernel takes hours through the remote backend.  They are CPU-tier
# tests (green in the fast tier); the on-chip tier runs the real kernels.
step "4. on-chip QMC tests" 3600 env MCOP_TPU_TESTS=1 python -m pytest tests/test_qmc.py -q -k "not interpret"

log "queue done"
