#!/bin/bash
# One-shot on-chip measurement program (run when the TPU tunnel is up):
# correctness checks first, then the round-4 A/B set — bf16 one-hot
# split on/off, bounds-window sweep, headline + SPMD benches, CG/ALECG
# benches (XLA vs fused megakernel, both now riding the split), fused
# multimat validation, pdg/dgp2/walker benches.  Each step bounded;
# results appended to the log with timestamps.
cd "$(dirname "$0")/.." || exit 1
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"
LOG=${1:-/tmp/onchip_results.log}
run() {
  echo "=== $* — $(date -u +%H:%M:%S)" | tee -a "$LOG"
  timeout 590 "$@" 2>&1 | tail -8 | tee -a "$LOG"
}
# correctness FIRST: the fused kernels vs the XLA path on silicon,
# default flags (the full fusion stack + bf16 split) and split-off
run python tools/check_fused.py 12 256
run env QUINOA_BF16_ONEHOT=0 python tools/check_fused.py 12 256
run python tools/check_multimat_fused.py
# headline + the off-switch fallbacks
run python bench.py --inner
run env QUINOA_BF16_ONEHOT=0 python bench.py --inner
run env QUINOA_FAR_SR=0 python bench.py --inner
# bounds-window sweep (limiter bounds kernel; default 512)
run env QUINOA_BOUNDS_W=256 python bench.py --inner
run env QUINOA_BOUNDS_W=1024 python bench.py --inner
# SPMD path (stacked plans; windows can double -> exercises K-chunking)
run python bench.py --npes 1
# CG (XLA-only: the DiagCG megakernel was removed after losing its
# A/B) and ALECG fused-vs-XLA on-chip parity + A/B
run python tools/check_alecg_fused.py 16
run python bench_cg.py 48
run python bench_alecg.py
run env QUINOA_CG_FUSED=0 python bench_alecg.py
run python bench.py --pdg
run python bench.py --dgp2
run python bench_walker.py
echo "=== done — $(date -u +%H:%M:%S)" | tee -a "$LOG"
