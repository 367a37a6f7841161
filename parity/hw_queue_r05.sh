#!/bin/bash
# Round-5 TPU work queue: waits for the axon tunnel, then runs the
# queued hardware measurements in order, logging everything.
set -u
LOG=/tmp/hw_queue_r05.log
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo

log() { echo "[$(date +%H:%M:%S)] $*" >> "$LOG"; }

log "queue start; probing tunnel..."
for i in $(seq 1 360); do
  if timeout 120 python - <<'EOF' >/dev/null 2>&1
import jax, jax.numpy as jnp, numpy as np
np.asarray(jax.jit(lambda a: a*2+1)(jnp.ones(8)))
EOF
  then
    log "tunnel up after probe $i"
    break
  fi
  log "probe $i: tunnel down"
  sleep 60
done

log "=== 1. fused-QMC long-horizon drive (1825 steps) ==="
timeout 3600 python parity/qmc_long_drive.py >> "$LOG" 2>&1
log "qmc_long_drive rc=$?"

log "=== 2. bench.py baseline (self-normalizing RTT fields) ==="
timeout 2400 python bench.py > /tmp/bench_r05_base.json 2>>"$LOG"
log "bench base rc=$?"
tail -1 /tmp/bench_r05_base.json >> "$LOG"

log "=== 3. staggered schedule A/B ==="
BENCH_INTERLEAVE=2 timeout 2400 python bench.py > /tmp/bench_r05_il2.json 2>>"$LOG"
log "bench interleave=2 chained rc=$?"
tail -1 /tmp/bench_r05_il2.json >> "$LOG"
BENCH_INTERLEAVE=2 BENCH_SCHEDULE=staggered timeout 2400 python bench.py > /tmp/bench_r05_stag.json 2>>"$LOG"
log "bench interleave=2 staggered rc=$?"
tail -1 /tmp/bench_r05_stag.json >> "$LOG"

log "=== 4. on-chip QMC tests (fused single-tile variance win at truncated set) ==="
MCOP_TPU_TESTS=1 timeout 3600 python -m pytest tests/test_qmc.py -q >> "$LOG" 2>&1
log "tpu qmc tests rc=$?"

log "queue done"
