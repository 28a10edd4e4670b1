#!/bin/bash
# Round-4 TPU queue: retrain the exp-1 full-budget stack (flows 50
# epochs, disc ratio 30, classifier 3 — reference budgets) into
# parity_runs/exp1_full, then the default mc_feng eval sweep. Run-dir
# checkpoints from round 3 were wiped between rounds; this recreates them
# for the round-4 SMC-guidance study and re-baselines mc_feng on current
# code.
# -> docs/results_r4/exp1_full_budget_eval_r4.json + sample grids
set -u
cd "$(dirname "$0")/.."
REPO=$(pwd)
export PYTHONPATH=$REPO:${PYTHONPATH:-}
echo $$ > /tmp/tpu_queue_r4stack.pid
WD=$REPO/parity_runs/exp1_full
mkdir -p "$WD"
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

if [ ! -d "$WD/checkpoints/mnist_classifier" ]; then
  stage h_cls python -m $CLI.train_classifier
fi
if [ ! -d "$WD/checkpoints/flow_x_best" ]; then
  stage h_flow_x python -m $CLI.train_flow --modality x --dtype bf16
fi
if [ ! -d "$WD/checkpoints/flow_y_rotate90_best" ]; then
  stage h_flow_y python -m $CLI.train_flow --modality y \
      --transform_type rotate90 --dtype bf16
fi
if [ ! -d "$WD/checkpoints/ratio_disc_rotate90_best" ]; then
  stage h_ratio python -m $CLI.train_ratio --loss_type disc \
      --transform_type rotate90 --dtype bf16
fi
rm -f "$WD/outputs/evaluation_results.json"
stage h_eval python -m $CLI.evaluate \
    --transform_type rotate90 \
    --guidance_methods none mc_feng \
    --guidance_strengths 0 0.5 1.0 2.0 5.0 \
    --num_samples 512 --dtype bf16 --fid --save_samples
cp "$WD"/outputs/evaluation_results.json \
   "$REPO"/docs/results_r4/exp1_full_budget_eval_r4.json \
  && echo "saved docs/results_r4/exp1_full_budget_eval_r4.json"
echo "QUEUE_R4STACK DONE"
