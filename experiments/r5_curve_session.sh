#!/bin/bash
# Round-5 serialized TPU session 3: the full production curve, re-measured in
# one clean process (one TPU job, nothing else on the single host core), and
# saved as the regression-gate baseline (benchmarks/curve_baseline.json).
set -u
cd "$(dirname "$0")/.."
LOG=experiments/r5_curve.log
: > "$LOG"
echo "=== curve [$(date -u +%H:%M:%S)] ===" | tee -a "$LOG"
python -m webgpu_msm_twisted_edwards_tpu.benchmarks full \
    --powers 12 16 17 18 19 20 21 22 23 --runs 5 --save-baseline \
    2>&1 | tee -a "$LOG"
echo "=== done [$(date -u +%H:%M:%S)] ===" | tee -a "$LOG"
