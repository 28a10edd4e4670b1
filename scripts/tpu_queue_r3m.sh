#!/bin/bash
# Round-3m TPU queue: grad guidance re-judged on the PRODUCTION stack.
# DESIGN.md 7c retired grad based on the round-2 light-budget
# checkpoints; this runs the same pay-or-retire eval on the exp-1
# full-budget stack (50-epoch flows, 30-epoch disc ratio) to test
# whether a fully-trained discriminator's gradient field changes the
# verdict. Eval-only; all checkpoints already exist in
# parity_runs/exp1_full. -> docs/results_r3/exp1_full_budget_grad_eval.json
set -u
cd "$(dirname "$0")/.."
REPO=$(pwd)
export PYTHONPATH=$REPO:${PYTHONPATH:-}
echo $$ > /tmp/tpu_queue_r3m.pid
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

rm -f "$WD/outputs/evaluation_results.json"
# grad const scale was the only standalone variant that moved at all
# (DESIGN.md 7c: 0.174 at gamma=20); probe its best and a moderate point,
# plus the sigma-scaled combined mode at the recommended operating point.
stage m_grad python -m $CLI.evaluate \
    --transform_type rotate90 \
    --guidance_methods none grad \
    --guidance_strengths 0 5 20 \
    --num_samples 512 --dtype bf16 --fid
cp "$WD"/outputs/evaluation_results.json \
   "$REPO"/docs/results_r3/exp1_full_budget_grad_eval.json \
  && echo "saved grad eval"
rm -f "$WD/outputs/evaluation_results.json"
stage m_combined python -m $CLI.evaluate \
    --transform_type rotate90 \
    --guidance_methods mc_feng+grad \
    --guidance_strengths 1.0 \
    --grad_strength 5 --grad_scale sigma \
    --num_samples 512 --dtype bf16 --fid
cp "$WD"/outputs/evaluation_results.json \
   "$REPO"/docs/results_r3/exp1_full_budget_gradcombined_eval.json \
  && echo "saved combined eval"
echo "QUEUE_R3M DONE"
