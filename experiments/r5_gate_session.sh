#!/bin/bash
# Round-5 serialized TPU session 2 (VERDICT r4 #7/#8): DMA-gate densification
# at the 2^18/2^19 group sizes and the row-width probe.  One TPU process at a
# time; no concurrent CPU work (CLAUDE.md).  Results: experiments/r5_gate.log.
set -u
cd "$(dirname "$0")/.."
LOG=experiments/r5_gate.log
: > "$LOG"

run() {
  local tag="$1"; shift
  echo "=== $tag  [$(date -u +%H:%M:%S)] ===" | tee -a "$LOG"
  "$@" 2>&1 | tee -a "$LOG"
}

B="python -m webgpu_msm_twisted_edwards_tpu.benchmarks"
run p18_xla env MSM_DMA_GATHER=0 $B full --powers 18 --runs 5
run p18_dma env MSM_DMA_GATHER_MIN_ROWS=1 $B full --powers 18 --runs 5
run p19_xla env MSM_DMA_GATHER=0 $B full --powers 19 --runs 5
run p19_dma env MSM_DMA_GATHER_MIN_ROWS=1 $B full --powers 19 --runs 5
run row_width python experiments/row_width_probe.py
echo "=== done [$(date -u +%H:%M:%S)] ===" | tee -a "$LOG"
