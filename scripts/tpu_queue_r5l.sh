#!/bin/bash
# Round-5 queue L: bench re-run — fused16 + fast_rng composed cell.
set -u
cd "$(dirname "$0")/.."
REPO=$(pwd)
export PYTHONPATH=$REPO:${PYTHONPATH:-}
source "$REPO/scripts/tpu_stage_lib.sh"
echo $$ > /tmp/tpu_queue_r5l.pid

wait_queue /tmp/tpu_queue_r5k.pid

stage l1_bench "$REPO" python bench.py
track_results "Round-5 queue L: bench with fused16+fast_rng composed train rate" \
  bench_details.json
echo "QUEUE_R5L DONE"
