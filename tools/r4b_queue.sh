#!/bin/bash
# Round-4b on-chip queue: profile the 59 ms step, then re-bracket the
# face-kernel tile/window sizes under the new bf16x3 one-hot default
# (the pre-bf16 bracket TF=512/W=128 was measured when the MXU passes
# cost 2x more — the optimum may have moved).
cd "$(dirname "$0")/.." || exit 1
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"
LOG=${1:-/tmp/r4b_results.log}
run() {
  echo "=== $* — $(date -u +%H:%M:%S)" | tee -a "$LOG"
  timeout 590 "$@" 2>&1 | grep -v WARNING | tail -8 | tee -a "$LOG"
}
run python tools/profile_trace.py 48
run env QUINOA_FACE_TF=128 python bench.py --inner
run env QUINOA_FACE_TF=1024 python bench.py --inner
run env QUINOA_FACE_W=256 python bench.py --inner
run env QUINOA_FAR_SR=0 python bench.py --inner
echo "=== done — $(date -u +%H:%M:%S)" | tee -a "$LOG"
