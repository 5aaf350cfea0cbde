#!/bin/bash
# Compile-host recovery watcher (round-4 pattern, see CLAUDE.md).
#
# Probes the hosted TPU worker with short-lived subprocesses (axon backend
# init blocks forever during outages — never probe in-process), and when
# the encoder-kernel compile canary passes (the degraded compile helper's
# proven victim), runs the authoritative headline
# (tools/headline_runs.py 3) once and exits. All chip-touching commands
# serialize on flock /tmp/chip.lock so manual chip jobs (run them under
# the same lock) never overlap.
#
# Usage:  nohup tools/chip_watch.sh [max_hours=6] >/dev/null 2>&1 &
#         tail -f /tmp/headline_watch.log
set -u
LOG=/tmp/headline_watch.log
cd "$(dirname "$0")/.."
echo "watch start $(date)" >> "$LOG"
export PYTHONPATH=/root/.axon_site
export JAX_PLATFORMS=axon
unset FLOWCOMPARE_BENCH_RUNG FLOWCOMPARE_BENCH_PRESET FLOWCOMPARE_BENCH_BATCH \
      FLOWCOMPARE_BENCH_ENCODER FLOWCOMPARE_BENCH_FUSED FLOWCOMPARE_BENCH_DEADLINE \
      FLOWCOMPARE_BENCH_BUDGET FLOWCOMPARE_BENCH_WAIT FLOWCOMPARE_BENCH_CHUNK 2>/dev/null
END=$(( $(date +%s) + ${1:-6} * 3600 ))
while [ "$(date +%s)" -lt "$END" ]; do
  if ! flock -w 3600 /tmp/chip.lock timeout 90 python -c \
      "import jax, jax.numpy as jnp; print(float((jnp.ones((8,8))@jnp.ones((8,8))).sum()))" >> "$LOG" 2>&1; then
    echo "worker down $(date)" >> "$LOG"; sleep 300; continue
  fi
  if flock -w 3600 /tmp/chip.lock timeout 600 python tools/probe_encoder_compile.py >> "$LOG" 2>&1; then
    echo "ENCODER_HEALTHY $(date) — running headline_runs 3" >> "$LOG"
    if flock -w 3600 /tmp/chip.lock timeout 3600 python tools/headline_runs.py 3 >> "$LOG" 2>&1; then
      echo "HEADLINE_DONE $(date)" >> "$LOG"
      exit 0
    fi
    echo "headline_runs failed $(date); will re-probe" >> "$LOG"
    sleep 300
  else
    echo "encoder compile still degraded $(date)" >> "$LOG"
    sleep 900
  fi
done
echo "WATCH_TIMEOUT $(date)" >> "$LOG"
