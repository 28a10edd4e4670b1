#!/bin/bash
# Round-4 TPU queue, session 5: the VM was recycled again, wiping
# parity_runs, so the queued mc_refresh study (tpu_queue_r4_refresh.sh)
# and the exp-2 SMC gamma=5 completion (tpu_queue_r4_final.sh F) never
# ran. Rebuild the stacks (deterministic — reproduces round-3 metrics to
# the third digit, ROUND4.md §3) and run the pending studies in value
# order:
#   A.  exp-1 full-budget stack retrain (prereq)
#   H1. mc_refresh=2, gamma 1/2        -> mc_refresh2_eval.json
#   H2. mc_refresh=4, gamma 1/2/5      -> mc_refresh4_eval.json
#   H3. mc_refresh=4 x 4 chunks, g=2   -> mc_refresh4_chunked.json
#   E.  exp-2 full-budget stack retrain
#   F.  exp-2 SMC gamma=5, churn=1.0   -> exp2_smc_churn1_g5.json
# Controls for H (same stack, default chunked eval): unguided 0.105/91;
# mc_feng g=1 0.824/218, g=2 0.861/267, g=5 0.885/376
# (docs/results_r4/exp1_full_budget_eval_r4.json).
set -u
cd "$(dirname "$0")/.."
REPO=$(pwd)
export PYTHONPATH=$REPO:${PYTHONPATH:-}
echo $$ > /tmp/tpu_queue_r4s5.pid
WD1=$REPO/parity_runs/exp1_full
WD2=$REPO/parity_runs/exp2_full
mkdir -p "$WD1" "$WD2"
STAGE=$REPO/scripts/tpu_run_stage.sh
CLI=ratio_guided_multimodal_fm_tpu.cli
OUT=$REPO/docs/results_r4
mkdir -p "$OUT"

preflight() {
  for i in $(seq 1 30); do
    if timeout 60 python -c "import jax,jax.numpy as jnp; (jnp.ones((8,8))@jnp.ones((8,8))).block_until_ready()" >/dev/null 2>&1; then
      echo "preflight ok ($1)"; return 0
    fi
    echo "preflight retry $i ($1)"; sleep 30
  done
  echo "preflight FAILED ($1)"; return 1
}

stage() {  # stage <name> <workdir> <cmd...>
  local name=$1 wd=$2; shift 2
  preflight "$name" || exit 1
  bash "$STAGE" "$name" "$wd" "$@" || { echo "stage $name FAILED"; exit 1; }
  sleep 150   # lazy chip release before the next client
}

# ---------- A. exp-1 full-budget stack ----------
if [ ! -d "$WD1/checkpoints/mnist_classifier" ]; then
  stage a_cls "$WD1" python -m $CLI.train_classifier
fi
if [ ! -d "$WD1/checkpoints/flow_x_best" ]; then
  stage a_flow_x "$WD1" python -m $CLI.train_flow --modality x --dtype bf16
fi
if [ ! -d "$WD1/checkpoints/flow_y_rotate90_best" ]; then
  stage a_flow_y "$WD1" python -m $CLI.train_flow --modality y \
      --transform_type rotate90 --dtype bf16
fi
if [ ! -d "$WD1/checkpoints/ratio_disc_rotate90_best" ]; then
  stage a_ratio "$WD1" python -m $CLI.train_ratio --loss_type disc \
      --transform_type rotate90 --dtype bf16
fi
echo "STACK_EXP1 DONE"

# ---------- H1. refresh=2 ----------
if [ ! -f "$OUT/mc_refresh2_eval.json" ]; then
  rm -f "$WD1/outputs/evaluation_results.json"
  stage h1_refresh2 "$WD1" python -m $CLI.evaluate \
      --transform_type rotate90 --guidance_methods mc_feng \
      --guidance_strengths 1.0 2.0 --mc_refresh 2 \
      --num_samples 512 --dtype bf16 --fid
  cp "$WD1/outputs/evaluation_results.json" "$OUT/mc_refresh2_eval.json" \
    && echo "saved $OUT/mc_refresh2_eval.json"
fi

# ---------- H2. refresh=4 ----------
if [ ! -f "$OUT/mc_refresh4_eval.json" ]; then
  rm -f "$WD1/outputs/evaluation_results.json"
  stage h2_refresh4 "$WD1" python -m $CLI.evaluate \
      --transform_type rotate90 --guidance_methods mc_feng \
      --guidance_strengths 1.0 2.0 5.0 --mc_refresh 4 \
      --num_samples 512 --dtype bf16 --fid
  cp "$WD1/outputs/evaluation_results.json" "$OUT/mc_refresh4_eval.json" \
    && echo "saved $OUT/mc_refresh4_eval.json"
fi

# ---------- H3. refresh=4 composed with 4 chunks ----------
if [ ! -f "$OUT/mc_refresh4_chunked.json" ]; then
  rm -f "$WD1/outputs/evaluation_results.json"
  stage h3_refresh4_chunked "$WD1" python -m $CLI.evaluate \
      --transform_type rotate90 --guidance_methods mc_feng \
      --guidance_strengths 2.0 --mc_refresh 4 --eval_chunks 4 \
      --num_samples 512 --dtype bf16 --fid
  cp "$WD1/outputs/evaluation_results.json" "$OUT/mc_refresh4_chunked.json" \
    && echo "saved $OUT/mc_refresh4_chunked.json"
fi
echo "QUEUE_H DONE"

# ---------- E. exp-2 full-budget stack ----------
if [ ! -d "$WD2/checkpoints/mnist32_classifier" ]; then
  stage e_cls "$WD2" python -m $CLI.train_classifiers_mnist_svhn
fi
if [ ! -d "$WD2/checkpoints/flow_mnist32_best" ]; then
  stage e_flow_m "$WD2" python -m $CLI.train_flow_mnist32 --dtype bf16
fi
if [ ! -d "$WD2/checkpoints/flow_svhn_best" ]; then
  stage e_flow_s "$WD2" python -m $CLI.train_flow_svhn --dtype bf16
fi
if [ ! -d "$WD2/checkpoints/ratio_disc_mnist_svhn_best" ]; then
  stage e_ratio "$WD2" python -m $CLI.train_ratio_mnist_svhn --dtype bf16
fi
echo "STACK_EXP2 DONE"

# ---------- F. exp-2 SMC gamma=5 at churn=1.0 ----------
if [ ! -f "$OUT/exp2_smc_churn1_g5.json" ]; then
  rm -f "$WD2/outputs/mnist_svhn/evaluation_results.json"
  stage f_smc_g5 "$WD2" python -m $CLI.evaluate_mnist_svhn \
      --guidance_methods smc --guidance_strengths 5.0 \
      --num_samples 512 --dtype bf16 --fid
  cp "$WD2"/outputs/mnist_svhn/evaluation_results.json \
     "$OUT/exp2_smc_churn1_g5.json" \
    && echo "saved $OUT/exp2_smc_churn1_g5.json"
fi
echo "QUEUE_R4S5 DONE"
