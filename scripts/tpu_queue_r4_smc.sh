#!/bin/bash
# Round-4 TPU queue: the SMC (particle-filter) guidance study on the
# exp-1 full-budget stack (train first: scripts/tpu_queue_r4_stack.sh).
#
# Stages:
#   1. smc gamma-sweep (gamma 0/0.5/1/2/5, default churn=0.5 tau=0.5),
#      512 samples, classifier-FID on -> docs/results_r4/smc_gamma_sweep.json
#   2. churn ablation at gamma=2 (churn 0.25 / 1.0)
#   3. throughput: scripts/smc_bench.py (smc vs none vs mc_feng)
#   4. sample grid PNG at the recommended point
# All stages run under tpu_run_stage.sh (wedge watchdog) after a
# preflight; 150s sleeps cover the lazy chip release (CLAUDE.md).
set -u
cd "$(dirname "$0")/.."
REPO=$(pwd)
export PYTHONPATH=$REPO:${PYTHONPATH:-}
echo $$ > /tmp/tpu_queue_r4smc.pid
WD=$REPO/parity_runs/exp1_full
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

[ -d "$WD/checkpoints/ratio_disc_rotate90_best" ] || {
  echo "train the stack first (tpu_queue_r4_stack.sh)"; exit 1; }

rm -f "$WD/outputs/evaluation_results.json"
stage smc_gamma python -m $CLI.evaluate \
    --transform_type rotate90 --guidance_methods smc \
    --guidance_strengths 0 0.5 1.0 2.0 5.0 \
    --num_samples 512 --dtype bf16 --fid
cp "$WD/outputs/evaluation_results.json" "$OUT/smc_gamma_sweep.json" \
  && echo "saved $OUT/smc_gamma_sweep.json"

for CH in 0.25 1.0; do
  rm -f "$WD/outputs/evaluation_results.json"
  stage smc_churn$CH python -m $CLI.evaluate \
      --transform_type rotate90 --guidance_methods smc \
      --guidance_strengths 2.0 --smc_churn $CH \
      --num_samples 512 --dtype bf16 --fid
  cp "$WD/outputs/evaluation_results.json" "$OUT/smc_churn$CH.json" \
    && echo "saved $OUT/smc_churn$CH.json"
done

# few-step composition: SMC over the midpoint-12 fast grid (selection
# events scale with steps — does particle guidance survive 24 NFE?)
rm -f "$WD/outputs/evaluation_results.json"
stage smc_fast python -m $CLI.evaluate \
    --transform_type rotate90 --guidance_methods smc \
    --guidance_strengths 2.0 --solver midpoint --num_steps 12 \
    --num_samples 512 --dtype bf16 --fid
cp "$WD/outputs/evaluation_results.json" "$OUT/smc_fast_midpoint12.json" \
  && echo "saved $OUT/smc_fast_midpoint12.json"

stage smc_bench python "$REPO/scripts/smc_bench.py"

stage smc_grid python -m $CLI.sample \
    --guidance_method smc --guidance_strength 2.0 \
    --num_samples 64 --dtype bf16
cp "$WD/outputs/samples_smc_gamma2.0_rotate90.png" "$OUT/" 2>/dev/null || true

echo "QUEUE_R4SMC DONE"
