#!/bin/bash
# Round-5 queue G: FM train-step profile (fwd/bwd/opt phase split +
# backward B-sweep + device op table) — the op-level evidence behind
# ROUND5.md §6's "the FM trainer is compute-bound in the backward pass".
set -u
cd "$(dirname "$0")/.."
REPO=$(pwd)
export PYTHONPATH=$REPO:${PYTHONPATH:-}
source "$REPO/scripts/tpu_stage_lib.sh"
echo $$ > /tmp/tpu_queue_r5g.pid

OUT=$REPO/docs/results_r5
mkdir -p "$OUT"

wait_queue /tmp/tpu_queue_r5f.pid

stage g1_profile_train "$REPO" python scripts/profile_train.py \
    --out "$OUT/profile_train.json" --trace_dir /tmp/r5_train_trace

track_results "Round-5 queue G: FM train-step profile (fwd/bwd/opt split, backward B-sweep, op table)" \
  "$OUT/profile_train.json"
echo "QUEUE_R5G DONE"
