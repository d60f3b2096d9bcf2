#!/bin/bash
# Round-5 on-chip sweep: re-bracket the face-pass tile/window sizes and
# the bounds window under the bf16x3 one-hot default (the r3 bracket
# TF=128/W=128 was measured when MXU passes cost 2x more — cheaper
# one-hot builds move the optimum toward wider windows), then the ALECG
# compflow fused-vs-XLA A/B (VERDICT r4 task 4).
cd "$(dirname "$0")/.." || exit 1
export PYTHONPATH="/root/.axon_site:$PWD"
LOG=${1:-/tmp/r5_sweep.log}
run() {
  echo "=== $* — $(date -u +%H:%M:%S)" | tee -a "$LOG"
  timeout 560 "$@" 2>&1 | grep -v WARNING | tail -4 | tee -a "$LOG"
}
run env QUINOA_FACE_TF=256 python bench.py --inner
run env QUINOA_FACE_TF=512 python bench.py --inner
run env QUINOA_FACE_W=256 python bench.py --inner
run env QUINOA_BOUNDS_W=256 python bench.py --inner
run env QUINOA_BOUNDS_W=1024 python bench.py --inner
run python bench_alecg.py 48
run env QUINOA_CG_FUSED=0 python bench_alecg.py 48
run python bench_alecg.py --compflow 48
run env QUINOA_CG_FUSED=0 python bench_alecg.py --compflow 48
echo "=== done — $(date -u +%H:%M:%S)" | tee -a "$LOG"
