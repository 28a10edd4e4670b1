#!/bin/bash
# Round-5 queue A: finish the EMA and exp-2 SMC curves (VERDICT.md item 3).
#
#   A1. rebuild the exp-1 EMA flow stack (parity_runs/exp1_ema was wiped
#       between rounds; retrain is deterministic — ROUND4.md §3)
#   A2. EMA + mc_feng gamma=2,5   -> does EMA+higher-gamma dominate raw?
#       Controls (raw stack): g=2 0.861 / FID 267 / entropy 2.00,
#                             g=5 0.885 / FID 376.  EMA g=1: 0.682 / 149 / 2.22.
#   A3. EMA + SMC gamma=1,2 (churn=1.0 island-16 defaults)
#       Controls (raw): g=2 0.773 / entropy 1.79 / FID 321.
#   A4. exp-2 SMC island-size probes (group 8 / 64 at g=2, churn=1.0) —
#       attack the 0.70-vs-0.875 cross-modal gap on the BatchNorm ratio net.
#       Controls (exp2, group16): g=1 0.600, g=2 0.621, g=5 0.697.
#   A5. exp-2 SMC tau probes (0.3 / 0.7 at g=2, churn=1.0, group16).
set -u
cd "$(dirname "$0")/.."
REPO=$(pwd)
export PYTHONPATH=$REPO:${PYTHONPATH:-}
source "$REPO/scripts/tpu_stage_lib.sh"
echo $$ > /tmp/tpu_queue_r5a.pid

WD=$REPO/parity_runs/exp1_ema
SRC=$REPO/parity_runs/exp1_full
WD2=$REPO/parity_runs/exp2_full
CLI=ratio_guided_multimodal_fm_tpu.cli
OUT=$REPO/docs/results_r5
mkdir -p "$OUT" "$WD/checkpoints"

wait_queue /tmp/tpu_queue_r4rema.pid

# eval prerequisites trained in exp1_full (flow-agnostic)
for ck in mnist_classifier ratio_disc_rotate90_best; do
  [ -e "$WD/checkpoints/$ck" ] || cp -r "$SRC/checkpoints/$ck" "$WD/checkpoints/$ck"
done

# ---------- A1. EMA flow stack ----------
if [ ! -d "$WD/checkpoints/flow_x_ema_best" ]; then
  stage a1_flow_x "$WD" python -m $CLI.train_flow --modality x --dtype bf16 \
      --ema_decay 0.999
fi
if [ ! -d "$WD/checkpoints/flow_y_rotate90_ema_best" ]; then
  stage a1_flow_y "$WD" python -m $CLI.train_flow --modality y \
      --transform_type rotate90 --dtype bf16 --ema_decay 0.999
fi

# ---------- A2. EMA + mc_feng gamma 2,5 ----------
if [ ! -f "$OUT/ema_comp_mcfeng.json" ]; then
  rm -f "$WD/outputs/evaluation_results.json"
  stage a2_mcfeng "$WD" python -m $CLI.evaluate \
      --transform_type rotate90 --ema \
      --guidance_methods mc_feng --guidance_strengths 2.0 5.0 \
      --num_samples 512 --dtype bf16 --fid
  cp "$WD/outputs/evaluation_results.json" "$OUT/ema_comp_mcfeng.json" \
    && echo "saved $OUT/ema_comp_mcfeng.json"
fi

# ---------- A3. EMA + SMC gamma 1,2 ----------
if [ ! -f "$OUT/ema_comp_smc.json" ]; then
  rm -f "$WD/outputs/evaluation_results.json"
  stage a3_smc "$WD" python -m $CLI.evaluate \
      --transform_type rotate90 --ema \
      --guidance_methods smc --guidance_strengths 1.0 2.0 \
      --num_samples 512 --dtype bf16 --fid
  cp "$WD/outputs/evaluation_results.json" "$OUT/ema_comp_smc.json" \
    && echo "saved $OUT/ema_comp_smc.json"
fi

# ---------- A4. exp-2 island-size probes ----------
for G in 8 64; do
  if [ ! -f "$OUT/exp2_smc_island$G.json" ]; then
    rm -f "$WD2/outputs/mnist_svhn/evaluation_results.json"
    stage a4_island$G "$WD2" python -m $CLI.evaluate_mnist_svhn \
        --guidance_methods smc --guidance_strengths 2.0 \
        --smc_group $G \
        --num_samples 512 --dtype bf16 --fid
    cp "$WD2/outputs/mnist_svhn/evaluation_results.json" \
       "$OUT/exp2_smc_island$G.json" \
      && echo "saved $OUT/exp2_smc_island$G.json"
  fi
done

# ---------- A5. exp-2 tau probes ----------
for TAU in 0.3 0.7; do
  TAG=${TAU/./}
  if [ ! -f "$OUT/exp2_smc_tau$TAG.json" ]; then
    rm -f "$WD2/outputs/mnist_svhn/evaluation_results.json"
    stage a5_tau$TAG "$WD2" python -m $CLI.evaluate_mnist_svhn \
        --guidance_methods smc --guidance_strengths 2.0 \
        --smc_resample_tau $TAU \
        --num_samples 512 --dtype bf16 --fid
    cp "$WD2/outputs/mnist_svhn/evaluation_results.json" \
       "$OUT/exp2_smc_tau$TAG.json" \
      && echo "saved $OUT/exp2_smc_tau$TAG.json"
  fi
done

track_results "Round-5 queue A results: EMA x guidance composition + exp2 SMC island/tau probes" \
  "$OUT"/ema_comp_*.json "$OUT"/exp2_smc_*.json docs/results_r4/ratio_ema_*.json
echo "QUEUE_R5A DONE"
