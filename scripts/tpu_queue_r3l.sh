#!/bin/bash
# Round-3l TPU queue: the encoder-decoder FlowMatchingModel family (M4,
# 9,104,513 params, the reference's `--model original` in train_flow.py)
# exercised END-TO-END on TPU at the reference's own budgets — both
# modality flows trained 50 epochs with `--model original`, then the
# default-flag guided eval sweep. Reuses the exp-1 full-budget stack's
# classifier + disc ratio checkpoints (the ratio/classifier nets are
# flow-model-agnostic: they see data pairs, not velocity nets) and the
# same frozen synthetic data so results are comparable to
# exp1_full_budget_eval.json (U-Net flows: gamma=1 coherence 0.824).
# -> docs/results_r3/original_fm_eval.json
set -u
cd "$(dirname "$0")/.."
REPO=$(pwd)
export PYTHONPATH=$REPO:${PYTHONPATH:-}
echo $$ > /tmp/tpu_queue_r3l.pid
SRC=$REPO/parity_runs/exp1_full
WD=$REPO/parity_runs/original_fm
mkdir -p "$WD/checkpoints"
# Same data; flow-agnostic eval classifier + ratio estimator.
[ -e "$WD/data" ] || ln -s "$SRC/data" "$WD/data"
for ck in mnist_classifier ratio_disc_rotate90_best; do
  [ -e "$WD/checkpoints/$ck" ] || ln -s "$SRC/checkpoints/$ck" "$WD/checkpoints/$ck"
done
STAGE=$REPO/scripts/tpu_run_stage.sh
CLI=ratio_guided_multimodal_fm_tpu.cli

preflight() {
  for i in $(seq 1 30); do
    if timeout 60 python -c "import jax,jax.numpy as jnp; (jnp.ones((8,8))@jnp.ones((8,8))).block_until_ready()" >/dev/null 2>&1; then
      echo "preflight ok ($1)"; return 0
    fi
    echo "preflight retry $i ($1)"; sleep 30
  done
  echo "preflight FAILED ($1)"; return 1
}

stage() {
  local name=$1; shift
  preflight "$name" || exit 1
  bash "$STAGE" "$name" "$WD" "$@" || { echo "stage $name FAILED"; exit 1; }
  sleep 150
}

if [ ! -d "$WD/checkpoints/flow_x_best" ]; then
  stage l_flow_x python -m $CLI.train_flow --modality x \
      --model original --dtype bf16
fi
if [ ! -d "$WD/checkpoints/flow_y_rotate90_best" ]; then
  stage l_flow_y python -m $CLI.train_flow --modality y \
      --transform_type rotate90 --model original --dtype bf16
fi
rm -f "$WD/outputs/evaluation_results.json"
stage l_eval python -m $CLI.evaluate \
    --transform_type rotate90 --model original \
    --guidance_methods none mc_feng \
    --guidance_strengths 0 0.5 1.0 2.0 5.0 \
    --num_samples 512 --dtype bf16 --fid --save_samples
cp "$WD"/outputs/evaluation_results.json \
   "$REPO"/docs/results_r3/original_fm_eval.json \
  && echo "saved docs/results_r3/original_fm_eval.json"
echo "QUEUE_R3L DONE"
