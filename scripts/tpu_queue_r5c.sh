#!/bin/bash
# Round-5 queue C: tier-C mega-kernel verdict bench (VERDICT r4 item 8).
set -u
cd "$(dirname "$0")/.."
REPO=$(pwd)
export PYTHONPATH=$REPO:${PYTHONPATH:-}
source "$REPO/scripts/tpu_stage_lib.sh"
echo $$ > /tmp/tpu_queue_r5c.pid

OUT=$REPO/docs/results_r5
mkdir -p "$OUT"

wait_queue /tmp/tpu_queue_r5b.pid

stage c1_resblock "$REPO" python scripts/resblock_kernel_bench.py \
    --out "$OUT/resblock_kernel_bench.json"

track_results "Round-5 queue C: tier-C fused GN+SiLU+conv kernel bench" \
  "$OUT/resblock_kernel_bench.json"
echo "QUEUE_R5C DONE"
