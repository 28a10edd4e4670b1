#!/bin/bash
# Round-4 TPU queue, part 5: does EMA actually help? The --ema_decay
# machinery landed this round (ROUND4.md §2) but has no on-chip quality
# numbers. This retrains the exp-1 flows at the reference budget WITH
# --ema_decay 0.999 (same seed/data as exp1_full, so the RAW weights
# reproduce the known 0.824/91 baseline — a built-in control), links the
# ratio/classifier checkpoints from exp1_full, and runs the default eval
# twice: raw vs --ema. The EMA claim to test: Polyak averaging smooths
# late-training oscillation -> better unguided FID at equal coherence.
set -u
cd "$(dirname "$0")/.."
REPO=$(pwd)
export PYTHONPATH=$REPO:${PYTHONPATH:-}
echo $$ > /tmp/tpu_queue_r4ema.pid
WD=$REPO/parity_runs/exp1_ema
SRC=$REPO/parity_runs/exp1_full
mkdir -p "$WD/checkpoints"
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

stage() {
  local name=$1; shift
  preflight "$name" || exit 1
  bash "$STAGE" "$name" "$WD" "$@" || { echo "stage $name FAILED"; exit 1; }
  sleep 150
}

# eval prerequisites trained in exp1_full (flow-agnostic)
for ck in mnist_classifier ratio_disc_rotate90_best; do
  [ -e "$WD/checkpoints/$ck" ] || cp -r "$SRC/checkpoints/$ck" "$WD/checkpoints/$ck"
done

if [ ! -d "$WD/checkpoints/flow_x_ema_best" ]; then
  stage e_flow_x python -m $CLI.train_flow --modality x --dtype bf16 \
      --ema_decay 0.999
fi
if [ ! -d "$WD/checkpoints/flow_y_rotate90_ema_best" ]; then
  stage e_flow_y python -m $CLI.train_flow --modality y \
      --transform_type rotate90 --dtype bf16 --ema_decay 0.999
fi

rm -f "$WD/outputs/evaluation_results.json"
stage e_eval_raw python -m $CLI.evaluate \
    --transform_type rotate90 \
    --guidance_methods none mc_feng \
    --guidance_strengths 0 1.0 \
    --num_samples 512 --dtype bf16 --fid
cp "$WD/outputs/evaluation_results.json" "$OUT/ema_eval_raw.json" \
  && echo "saved $OUT/ema_eval_raw.json"

rm -f "$WD/outputs/evaluation_results.json"
stage e_eval_ema python -m $CLI.evaluate \
    --transform_type rotate90 --ema \
    --guidance_methods none mc_feng \
    --guidance_strengths 0 1.0 \
    --num_samples 512 --dtype bf16 --fid
cp "$WD/outputs/evaluation_results.json" "$OUT/ema_eval_ema.json" \
  && echo "saved $OUT/ema_eval_ema.json"

echo "QUEUE_R4EMA DONE"
