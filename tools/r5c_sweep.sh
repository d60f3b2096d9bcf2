#!/bin/bash
# Round-5c on-chip queue: the step-decomposition ablations (timing-only
# QUINOA_ABLATE runs + --nolimit), the NB=4 solo retry with a longer
# compile budget, and the ALECG transport A/B retry (both legs timed
# out at 560 s on this box's cold cache).
cd "$(dirname "$0")/.." || exit 1
export PYTHONPATH="/root/.axon_site:$PWD"
LOG=${1:-/tmp/r5c_sweep.log}
run() {
  echo "=== timeout $1 $* — $(date -u +%H:%M:%S)" | tee -a "$LOG"
  t=$1; shift
  timeout "$t" "$@" 2>&1 | grep -v WARNING | tail -4 | tee -a "$LOG"
}
run 560 env QUINOA_ABLATE=far python bench.py --inner
run 560 env QUINOA_ABLATE=near python bench.py --inner
run 560 python bench.py --nolimit
run 900 env QUINOA_NEAR_NB=4 python bench.py --inner
run 900 python bench_alecg.py 48
run 900 env QUINOA_CG_FUSED=0 python bench_alecg.py 48
echo "=== done — $(date -u +%H:%M:%S)" | tee -a "$LOG"
