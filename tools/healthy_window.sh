#!/bin/bash
# Everything to bank during ONE healthy compile-host window, most valuable
# first (the host can re-degrade at any minute; each step's compiled
# programs land in the persistent cache, making later runs degradation-
# proof). Invoked by tools/chip_watch.sh when the encoder canary passes;
# safe to run manually under the chip lock:
#   flock /tmp/chip.lock tools/healthy_window.sh
set -u
cd "$(dirname "$0")/.."
LOG=${HEALTHY_WINDOW_LOG:-/tmp/healthy_window.log}
echo "healthy window start $(date)" >> "$LOG"
export PYTHONPATH=/root/.axon_site
export JAX_PLATFORMS=axon
unset FLOWCOMPARE_BENCH_RUNG FLOWCOMPARE_BENCH_PRESET FLOWCOMPARE_BENCH_BATCH \
      FLOWCOMPARE_BENCH_ENCODER FLOWCOMPARE_BENCH_FUSED FLOWCOMPARE_BENCH_DEADLINE \
      FLOWCOMPARE_BENCH_BUDGET FLOWCOMPARE_BENCH_WAIT FLOWCOMPARE_BENCH_CHUNK 2>/dev/null

rc_total=0
step() {  # step <name> <timeout_s> <cmd...>
  local name=$1 t=$2; shift 2
  echo "== $name $(date)" >> "$LOG"
  if timeout "$t" "$@" >> "$LOG" 2>&1; then
    echo "== $name OK $(date)" >> "$LOG"
  else
    echo "== $name FAILED rc=$? $(date)" >> "$LOG"; rc_total=1
  fi
}

# 1. The round's exit criterion: authoritative median-of->=3 headline.
step headline_runs 3600 python tools/headline_runs.py 3
# 2. Chunk-80 re-measures for the three round-3-methodology presets
#    (VERDICT r4 item 2). Each also caches its compiled programs.
step bench_presets 2700 python tools/bench_presets.py \
    dulcet-universe helpful-sponge swept-energy
# 3. helpful-sponge full-scale fused eval parity (needs the DGCNN trunk
#    kernel — impossible on a degraded host, VERDICT r4 weak item 4).
step sponge_parity 900 python tools/change_map_parity.py 20 \
    --preset helpful-sponge
# 4. Fused SA-grouping kernel A/B (round-5 addition, ops/sa_group_pallas).
step sa_group_ab 900 python tools/ab_sa_group.py
# 5. Regenerate the PARITY.md perf table from the fresh artifacts.
step perf_summary 120 python tools/perf_summary.py

echo "healthy window done rc=$rc_total $(date)" >> "$LOG"
exit "$rc_total"
