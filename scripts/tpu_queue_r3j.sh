#!/bin/bash
# Round-3j TPU queue: rerun r3i stage B, which was preempted at startup
# when the previous session ended (SIGTERM -> clean stop, nothing saved).
#  B) rotate180 — the WEAKEST transform in the 12-epoch sweep (0.178) —
#     at full reference budget (flow_y 50ep + disc ratio 30ep; flow_x and
#     the classifier are shared with the r3h stack)
#     -> docs/results_r3/exp1_full_budget_rotate180_eval.json
set -u
cd "$(dirname "$0")/.."
REPO=$(pwd)
export PYTHONPATH=$REPO:${PYTHONPATH:-}
echo $$ > /tmp/tpu_queue_r3j.pid
WD=$REPO/parity_runs/exp1_full
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

if [ ! -d "$WD/checkpoints/flow_y_rotate180_best" ]; then
  stage j_flow180 python -m $CLI.train_flow --modality y \
      --transform_type rotate180 --dtype bf16
fi
if [ ! -d "$WD/checkpoints/ratio_disc_rotate180_best" ]; then
  stage j_ratio180 python -m $CLI.train_ratio --loss_type disc \
      --transform_type rotate180 --dtype bf16
fi
rm -f "$WD/outputs/evaluation_results.json"
stage j_eval180 python -m $CLI.evaluate \
    --transform_type rotate180 \
    --guidance_methods none mc_feng \
    --guidance_strengths 0 0.5 1.0 2.0 5.0 \
    --num_samples 512 --dtype bf16 --fid
cp "$WD"/outputs/evaluation_results.json \
   "$REPO"/docs/results_r3/exp1_full_budget_rotate180_eval.json \
  && echo "saved exp1_full_budget_rotate180_eval.json"
echo "QUEUE_R3J DONE"
