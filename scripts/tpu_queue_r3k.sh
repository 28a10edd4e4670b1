#!/bin/bash
# Round-3k TPU queue: the last untested loss x experiment cell — RuLSIF
# on the CROSS-MODAL asymmetric estimator (RatioEstimatorMNISTSVHN) at
# the reference's 30-epoch budget, on the r3g full-budget exp-2 flows.
# Exp-1 RuLSIF at full budget showed the best diversity trade
# (exp1_full_budget_rulsif_eval.json); this checks the finding carries
# to the BatchNorm asymmetric-encoder estimator.
# -> docs/results_r3/exp2_full_budget_rulsif_eval.json
set -u
cd "$(dirname "$0")/.."
REPO=$(pwd)
export PYTHONPATH=$REPO:${PYTHONPATH:-}
echo $$ > /tmp/tpu_queue_r3k.pid
WD=$REPO/parity_runs/exp2_full
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

if [ ! -d "$WD/checkpoints/ratio_rulsif_mnist_svhn_best" ]; then
  stage k_rulsif python -m $CLI.train_ratio_mnist_svhn \
      --loss_type rulsif --dtype bf16
fi
rm -f "$WD/outputs/mnist_svhn/evaluation_results.json"
stage k_rulsif_eval python -m $CLI.evaluate_mnist_svhn \
    --loss_type rulsif \
    --guidance_methods none mc_feng \
    --guidance_strengths 0 0.5 1.0 2.0 5.0 \
    --num_samples 512 --dtype bf16 --fid
cp "$WD"/outputs/mnist_svhn/evaluation_results.json \
   "$REPO"/docs/results_r3/exp2_full_budget_rulsif_eval.json \
  && echo "saved exp2_full_budget_rulsif_eval.json"
echo "QUEUE_R3K DONE"
