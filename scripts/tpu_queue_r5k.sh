#!/bin/bash
# Round-5 queue K: bench re-run — lands the --fast_rng train rate
# (rbg dropout keys) in bench_details.json alongside the K-sweep.
set -u
cd "$(dirname "$0")/.."
REPO=$(pwd)
export PYTHONPATH=$REPO:${PYTHONPATH:-}
source "$REPO/scripts/tpu_stage_lib.sh"
echo $$ > /tmp/tpu_queue_r5k.pid

wait_queue /tmp/tpu_queue_r5j.pid

stage k1_bench "$REPO" python bench.py
track_results "Round-5 queue K: bench with --fast_rng train rate" \
  bench_details.json
echo "QUEUE_R5K DONE"
