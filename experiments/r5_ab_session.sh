#!/bin/bash
# Round-5 serialized TPU A/B session (VERDICT r4 #2/#6: quarter-store scan,
# i64 packed sort, DMA extraction gathers).  One TPU process at a time; no
# concurrent CPU work (CLAUDE.md).  Results land in experiments/r5_ab.log.
set -u
cd "$(dirname "$0")/.."
LOG=experiments/r5_ab.log
: > "$LOG"

run() {
  local tag="$1"; shift
  echo "=== $tag  [$(date -u +%H:%M:%S)] ===" | tee -a "$LOG"
  "$@" python -m webgpu_msm_twisted_edwards_tpu.benchmarks full \
      --powers "${POWERS[@]}" --runs 5 2>&1 | tee -a "$LOG"
}

POWERS=(20)
run base            env
run qstore          env MSM_SCAN_QSTORE=1
run sort_i64        env MSM_SORT_I64=1
run dma_extract     env MSM_DMA_EXTRACT=1
