#!/bin/bash
# Round-5d on-chip queue: lane-gather A/B (solo and with NB=4, whose
# extra gather cost the lane path removes), then the stale-number
# refreshes for PERFORMANCE.md (dgp2, pdg, SPMD npes=1) under the
# current default stack.
cd "$(dirname "$0")/.." || exit 1
export PYTHONPATH="/root/.axon_site:$PWD"
LOG=${1:-/tmp/r5d_sweep.log}
run() {
  t=$1; shift
  echo "=== timeout $t $* — $(date -u +%H:%M:%S)" | tee -a "$LOG"
  timeout "$t" "$@" 2>&1 | grep -v WARNING | tail -4 | tee -a "$LOG"
}
run 900 env QUINOA_LANE_GATHER=1 python bench.py --inner
run 900 env QUINOA_LANE_GATHER=1 QUINOA_NEAR_NB=4 python bench.py --inner
run 900 env QUINOA_LANE_GATHER=1 QUINOA_NEAR_NB=3 python bench.py --inner
run 900 python bench.py --dgp2
run 900 python bench.py --pdg
run 900 python bench.py --npes 1
echo "=== done — $(date -u +%H:%M:%S)" | tee -a "$LOG"
