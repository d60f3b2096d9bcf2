#!/bin/bash
# Round-5b on-chip queue: A/B the two new structural levers (RK update
# folded into the limit-kernel prologue; 4-block near right-state
# window), their combination, the far_sr fallback re-check under the
# smaller far stream, and the W=256 retry that timed out in r5a.
cd "$(dirname "$0")/.." || exit 1
export PYTHONPATH="/root/.axon_site:$PWD"
LOG=${1:-/tmp/r5b_sweep.log}
run() {
  echo "=== $* — $(date -u +%H:%M:%S)" | tee -a "$LOG"
  timeout 560 "$@" 2>&1 | grep -v WARNING | tail -4 | tee -a "$LOG"
}
run env QUINOA_RK_IN_KERNEL=1 python bench.py --inner
run env QUINOA_NEAR_NB=4 python bench.py --inner
run env QUINOA_NEAR_NB=4 QUINOA_RK_IN_KERNEL=1 python bench.py --inner
run env QUINOA_NEAR_NB=4 QUINOA_FAR_SR=0 python bench.py --inner
run env QUINOA_FACE_W=256 python bench.py --inner
echo "=== done — $(date -u +%H:%M:%S)" | tee -a "$LOG"
