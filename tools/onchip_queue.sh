#!/bin/bash
# One-shot on-chip measurement program (run when the TPU tunnel is up):
# far-stream A/B, headline + SPMD benches, CG/ALECG benches, fused
# multimat validation, pdg/dgp2 benches.  Each step bounded; results
# appended to the log with timestamps.
cd "$(dirname "$0")/.." || exit 1
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"
LOG=${1:-/tmp/onchip_results.log}
run() {
  echo "=== $* — $(date -u +%H:%M:%S)" | tee -a "$LOG"
  timeout 590 "$@" 2>&1 | tail -8 | tee -a "$LOG"
}
# correctness FIRST: the fused kernels vs the XLA path on silicon,
# default and with the full fusion-flag stack
run python tools/check_fused.py 12 256
run env QUINOA_LIMIT_IN_KERNEL=1 QUINOA_VOL_IN_KERNEL=1 QUINOA_FAR_SR=1 \
    python tools/check_fused.py 12 256
run python tools/ab_far_stream.py 48
run python bench.py --inner
run env QUINOA_LIMIT_IN_KERNEL=1 python bench.py --inner
run env QUINOA_LIMIT_IN_KERNEL=1 QUINOA_VOL_IN_KERNEL=1 python bench.py --inner
run env QUINOA_LIMIT_IN_KERNEL=1 QUINOA_VOL_IN_KERNEL=1 QUINOA_FAR_SR=1 python bench.py --inner
run env QUINOA_FACE_W=256 python bench.py --inner
run env QUINOA_FACE_W=512 python bench.py --inner
run python bench.py --npes 1
# CG-fused correctness on silicon BEFORE the QUINOA_CG_FUSED flip
run python tools/check_cg_fused.py 16
run python bench_cg.py 48
run env QUINOA_CG_FUSED=1 python bench_cg.py 48
run env QUINOA_CG_FUSED=1 QUINOA_CGF_TF=128 python bench_cg.py 48
run env QUINOA_CG_FUSED=1 QUINOA_CGF_W=2048 python bench_cg.py 48
run python bench_alecg.py
run env QUINOA_CG_FUSED=1 python bench_alecg.py
run python tools/check_multimat_fused.py
run python bench.py --pdg
run python bench_walker.py
run env QUINOA_PRNG_IMPL=rbg python bench_walker.py
run python bench.py --dgp2
run env QUINOA_SPLIT_FAR_GATHER=1 python bench.py --dgp2
echo "=== done — $(date -u +%H:%M:%S)" | tee -a "$LOG"
