#!/bin/bash
# Round-5 queue H: fwd-variant sweep — queue G measured the TRAIN forward
# at 34% MFU vs the sampler's ~60% on the same net/batch; this isolates
# whether dropout RNG / interpolate RNG / loss plumbing eats the gap.
set -u
cd "$(dirname "$0")/.."
REPO=$(pwd)
export PYTHONPATH=$REPO:${PYTHONPATH:-}
source "$REPO/scripts/tpu_stage_lib.sh"
echo $$ > /tmp/tpu_queue_r5h.pid

OUT=$REPO/docs/results_r5
mkdir -p "$OUT"

wait_queue /tmp/tpu_queue_r5g.pid

stage h1_fwd_variants "$REPO" python scripts/profile_train.py \
    --variants_only --out "$OUT/profile_train_variants.json"

track_results "Round-5 queue H: train-fwd variant sweep (dropout/RNG cost isolation)" \
  "$OUT/profile_train_variants.json"
echo "QUEUE_R5H DONE"
