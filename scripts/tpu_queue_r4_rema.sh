#!/bin/bash
# Round-4 study: EMA'd discriminator (--ema_decay on train_ratio,
# --ratio_ema at eval). Hypothesis: the Polyak-averaged ratio net lags
# the 30-epoch saturation (ROUND2.md §1) and its class-level r-hat bias,
# so guidance at fixed gamma should trade a little coherence for better
# label entropy / FID — the flow-EMA study (ROUND4.md §2) found exactly
# that shape on the flow side.
#
# Runs in parity_runs/exp1_full AFTER the session-5 queue: retraining the
# ratio with --ema_decay reproduces the raw weights bit-for-bit (the EMA
# update touches neither params nor the RNG stream — same control as the
# flow study), so overwriting ratio_disc_rotate90_best is a no-op and the
# run just adds the _ema_best sibling.
# Controls (same stack): mc_feng g=1 0.824/FID 218/entropy 2.06,
#                        g=2 0.861/267/2.00.
#   R1. retrain ratio --ema_decay 0.999
#   R2. eval mc_feng g=1,2 --ratio_ema  -> ratio_ema_eval.json
#   R3. eval smc g=2 --ratio_ema        -> ratio_ema_smc.json
set -u
cd "$(dirname "$0")/.."
REPO=$(pwd)
export PYTHONPATH=$REPO:${PYTHONPATH:-}
echo $$ > /tmp/tpu_queue_r4rema.pid
WD1=$REPO/parity_runs/exp1_full
STAGE=$REPO/scripts/tpu_run_stage.sh
CLI=ratio_guided_multimodal_fm_tpu.cli
OUT=$REPO/docs/results_r4
mkdir -p "$OUT"

for PF in /tmp/tpu_queue_r4s5.pid; do
  if [ -f "$PF" ]; then
    PREV=$(cat "$PF")
    while kill -0 "$PREV" 2>/dev/null; do
      echo "waiting on $PF (pid $PREV)"; sleep 60
    done
  fi
done
sleep 150   # lazy chip release

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
  sleep 150
}

if [ ! -d "$WD1/checkpoints/flow_x_best" ] || [ ! -d "$WD1/checkpoints/flow_y_rotate90_best" ]; then
  echo "exp1_full stack missing — run tpu_queue_r4_session5.sh first"; exit 1
fi

# ---------- R1. ratio retrain with EMA ----------
if [ ! -d "$WD1/checkpoints/ratio_disc_rotate90_ema_best" ]; then
  stage r1_ratio_ema "$WD1" python -m $CLI.train_ratio --loss_type disc \
      --transform_type rotate90 --dtype bf16 --ema_decay 0.999
fi

# ---------- R2. mc_feng eval with the EMA'd discriminator ----------
if [ ! -f "$OUT/ratio_ema_eval.json" ]; then
  rm -f "$WD1/outputs/evaluation_results.json"
  stage r2_eval "$WD1" python -m $CLI.evaluate \
      --transform_type rotate90 --guidance_methods mc_feng \
      --guidance_strengths 1.0 2.0 --ratio_ema \
      --num_samples 512 --dtype bf16 --fid
  cp "$WD1/outputs/evaluation_results.json" "$OUT/ratio_ema_eval.json" \
    && echo "saved $OUT/ratio_ema_eval.json"
fi

# ---------- R3. SMC eval with the EMA'd discriminator ----------
# SMC control (churn=1.0, island-16): g=2 -> 0.773 / entropy 1.79 / FID 321
if [ ! -f "$OUT/ratio_ema_smc.json" ]; then
  rm -f "$WD1/outputs/evaluation_results.json"
  stage r3_smc "$WD1" python -m $CLI.evaluate \
      --transform_type rotate90 --guidance_methods smc \
      --guidance_strengths 2.0 --ratio_ema \
      --num_samples 512 --dtype bf16 --fid
  cp "$WD1/outputs/evaluation_results.json" "$OUT/ratio_ema_smc.json" \
    && echo "saved $OUT/ratio_ema_smc.json"
fi
echo "QUEUE_R4REMA DONE"
