#!/bin/bash
# Round-4 follow-up queue: EMA x guidance composition on the EMA-trained
# exp-1 stack (parity_runs/exp1_ema, built by tpu_queue_r4_final.sh §B).
# The §B study measured EMA's trade at mc_feng gamma=1 only (FID -35%,
# coherence 0.824->0.682). Two open cells:
#   G1. EMA + SMC (gamma 1, 2 at the churn=1.0/island-16 defaults):
#       SMC is selection-on-ratio, not argmax steering — the hypothesis
#       is it loses less coherence on the smoother EMA field while
#       keeping the FID win ("best of both").
#   G2. EMA + mc_feng gamma 2, 5: completes the EMA trade curve beyond
#       the single gamma=1 row.
# Waits for the r4_final queue to fully exit before claiming the chip.
set -u
cd "$(dirname "$0")/.."
REPO=$(pwd)
export PYTHONPATH=$REPO:${PYTHONPATH:-}
echo $$ > /tmp/tpu_queue_r4ema2.pid
WDE=$REPO/parity_runs/exp1_ema
STAGE=$REPO/scripts/tpu_run_stage.sh
CLI=ratio_guided_multimodal_fm_tpu.cli
OUT=$REPO/docs/results_r4
mkdir -p "$OUT"

# ---- queue behind tpu_queue_r4_final.sh (single-client chip) ----
if [ -f /tmp/tpu_queue_r4final.pid ]; then
  PREV=$(cat /tmp/tpu_queue_r4final.pid)
  while kill -0 "$PREV" 2>/dev/null; do
    echo "waiting on r4_final queue (pid $PREV)"; sleep 60
  done
fi
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

# ---------- G1. EMA + SMC ----------
rm -f "$WDE/outputs/evaluation_results.json"
stage g1_ema_smc "$WDE" python -m $CLI.evaluate \
    --transform_type rotate90 --ema \
    --guidance_methods smc --guidance_strengths 1.0 2.0 \
    --num_samples 512 --dtype bf16 --fid
cp "$WDE/outputs/evaluation_results.json" "$OUT/ema_smc_eval.json" \
  || { echo "archive g1 FAILED"; exit 1; }
echo "saved $OUT/ema_smc_eval.json"

# ---------- G2. EMA + mc_feng gamma 2, 5 ----------
rm -f "$WDE/outputs/evaluation_results.json"
stage g2_ema_mcfeng "$WDE" python -m $CLI.evaluate \
    --transform_type rotate90 --ema \
    --guidance_methods mc_feng --guidance_strengths 2.0 5.0 \
    --num_samples 512 --dtype bf16 --fid
cp "$WDE/outputs/evaluation_results.json" "$OUT/ema_mcfeng_g2g5.json" \
  || { echo "archive g2 FAILED"; exit 1; }
echo "saved $OUT/ema_mcfeng_g2g5.json"

echo "QUEUE_R4EMA2 DONE"
