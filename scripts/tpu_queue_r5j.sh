#!/bin/bash
# Round-5 queue J: grad-rbg variant — queue H proved dropout's
# threefry masks cost 2.2 ms/step (fwd 34% -> 58% MFU with dropout off);
# this measures the same dropout-on loss with the XLA RngBitGenerator
# key family (jax.random.key(impl='rbg')), the candidate fix.
set -u
cd "$(dirname "$0")/.."
REPO=$(pwd)
export PYTHONPATH=$REPO:${PYTHONPATH:-}
source "$REPO/scripts/tpu_stage_lib.sh"
echo $$ > /tmp/tpu_queue_r5j.pid

OUT=$REPO/docs/results_r5
mkdir -p "$OUT"

wait_queue /tmp/tpu_queue_r5i.pid

stage j1_grad_rbg "$REPO" python scripts/profile_train.py \
    --variants_only --out "$OUT/profile_train_variants.json"

track_results "Round-5 queue J: grad+rbg full variant measurement" \
  "$OUT/profile_train_variants.json"
echo "QUEUE_R5I DONE"
