#!/bin/bash
# Round-4 TPU queue, final session: parity_runs was wiped again between
# driver sessions, so the queued hardening studies (r4 parts 5-6) never
# ran. This master queue recreates both checkpoint stacks and runs every
# pending study, highest-value first:
#   A. exp-1 full-budget stack retrain (prereq; deterministic — the r4
#      reproduction showed identical metrics to round 3)
#   B. EMA quality study (ROUND4.md §2 has machinery but no on-chip
#      quality numbers): retrain exp-1 flows with --ema_decay 0.999,
#      paired raw vs --ema default evals
#   C. SMC champion-config seed bars (gamma=2, churn=1.0, island-16):
#      seeds 7 & 1234 vs the seed-42 headline 0.773
#   D. few-step composition: SMC midpoint-12 + --time_grid early
#      (control: 0.701 uniform)
#   E. exp-2 full-budget stack retrain
#   F. exp-2 SMC gamma=5 at churn=1.0 (completes the cross-modal curve)
# All evals 512 samples, default flags unless shown.
set -u
cd "$(dirname "$0")/.."
REPO=$(pwd)
export PYTHONPATH=$REPO:${PYTHONPATH:-}
echo $$ > /tmp/tpu_queue_r4final.pid
WD1=$REPO/parity_runs/exp1_full
WDE=$REPO/parity_runs/exp1_ema
WD2=$REPO/parity_runs/exp2_full
mkdir -p "$WD1" "$WDE/checkpoints" "$WD2"
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

# ---------- B. EMA quality study ----------
for ck in mnist_classifier ratio_disc_rotate90_best; do
  [ -e "$WDE/checkpoints/$ck" ] || cp -r "$WD1/checkpoints/$ck" "$WDE/checkpoints/$ck"
done
if [ ! -d "$WDE/checkpoints/flow_x_ema_best" ]; then
  stage b_flow_x "$WDE" python -m $CLI.train_flow --modality x --dtype bf16 \
      --ema_decay 0.999
fi
if [ ! -d "$WDE/checkpoints/flow_y_rotate90_ema_best" ]; then
  stage b_flow_y "$WDE" python -m $CLI.train_flow --modality y \
      --transform_type rotate90 --dtype bf16 --ema_decay 0.999
fi
rm -f "$WDE/outputs/evaluation_results.json"
stage b_eval_raw "$WDE" python -m $CLI.evaluate \
    --transform_type rotate90 \
    --guidance_methods none mc_feng \
    --guidance_strengths 0 1.0 \
    --num_samples 512 --dtype bf16 --fid
cp "$WDE/outputs/evaluation_results.json" "$OUT/ema_eval_raw.json" \
  && echo "saved $OUT/ema_eval_raw.json"
rm -f "$WDE/outputs/evaluation_results.json"
stage b_eval_ema "$WDE" python -m $CLI.evaluate \
    --transform_type rotate90 --ema \
    --guidance_methods none mc_feng \
    --guidance_strengths 0 1.0 \
    --num_samples 512 --dtype bf16 --fid
cp "$WDE/outputs/evaluation_results.json" "$OUT/ema_eval_ema.json" \
  && echo "saved $OUT/ema_eval_ema.json"
echo "QUEUE_EMA DONE"

# ---------- C. SMC champion seed bars ----------
for SEED in 7 1234; do
  rm -f "$WD1/outputs/evaluation_results.json"
  stage c_smc_seed$SEED "$WD1" python -m $CLI.evaluate \
      --transform_type rotate90 --guidance_methods smc \
      --guidance_strengths 2.0 --seed $SEED \
      --num_samples 512 --dtype bf16 --fid
  cp "$WD1/outputs/evaluation_results.json" \
     "$OUT/smc_champion_seed$SEED.json" \
    && echo "saved $OUT/smc_champion_seed$SEED.json"
done
echo "QUEUE_SEEDBARS DONE"

# ---------- D. SMC midpoint-12 + early grid ----------
rm -f "$WD1/outputs/evaluation_results.json"
stage d_mp12_early "$WD1" python -m $CLI.evaluate \
    --transform_type rotate90 --guidance_methods smc \
    --guidance_strengths 2.0 --solver midpoint --num_steps 12 \
    --time_grid early \
    --num_samples 512 --dtype bf16 --fid
cp "$WD1/outputs/evaluation_results.json" \
   "$OUT/smc_mp12_early.json" \
  && echo "saved $OUT/smc_mp12_early.json"
echo "QUEUE_MP12EARLY DONE"

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

# ---------- F. exp-2 SMC gamma=5, churn=1.0 (default) ----------
rm -f "$WD2/outputs/mnist_svhn/evaluation_results.json"
stage f_exp2_g5 "$WD2" python -m $CLI.evaluate_mnist_svhn \
    --guidance_methods smc --guidance_strengths 5.0 \
    --num_samples 512 --dtype bf16 --fid
cp "$WD2/outputs/mnist_svhn/evaluation_results.json" \
   "$OUT/exp2_smc_churn1_g5.json" \
  && echo "saved $OUT/exp2_smc_churn1_g5.json"
echo "QUEUE_R4FINAL DONE"
