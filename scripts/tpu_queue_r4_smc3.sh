#!/bin/bash
# Round-4 TPU queue, part 3: CHURN as the SMC operating knob.
# The part-2 ablation showed churn dominates: at gamma=2 island-16,
# churn 0.25 -> 0.975 coherence but entropy 0.096 (clone collapse),
# 0.5 -> 0.604 @ 1.78, 1.0 -> 0.773 @ 1.79.  This queue maps the
# operating surface at churn=1.0 and probes past it:
#   1. island gamma sweep at churn=1.0: gamma 0.5/1/2/5
#   2. churn probes at gamma=2: churn in {1.5, 2.0}
set -u
cd "$(dirname "$0")/.."
REPO=$(pwd)
export PYTHONPATH=$REPO:${PYTHONPATH:-}
echo $$ > /tmp/tpu_queue_r4smc3.pid
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

rm -f "$WD/outputs/evaluation_results.json"
stage smc_c1_gamma python -m $CLI.evaluate \
    --transform_type rotate90 --guidance_methods smc \
    --guidance_strengths 0.5 1.0 2.0 5.0 --smc_churn 1.0 \
    --num_samples 512 --dtype bf16 --fid
cp "$WD/outputs/evaluation_results.json" "$OUT/smc_churn1_gamma_sweep.json" \
  && echo "saved $OUT/smc_churn1_gamma_sweep.json"

for C in 1.5 2.0; do
  rm -f "$WD/outputs/evaluation_results.json"
  stage smc_c$C python -m $CLI.evaluate \
      --transform_type rotate90 --guidance_methods smc \
      --guidance_strengths 2.0 --smc_churn $C \
      --num_samples 512 --dtype bf16 --fid
  cp "$WD/outputs/evaluation_results.json" "$OUT/smc_churn$C.json" \
    && echo "saved $OUT/smc_churn$C.json"
done

# Cross-modal (exp-2) SMC at churn=1.0 — the exp-2 queue's own SMC sweep
# ran at the old default churn 0.5; this adds the churn-corrected rows.
WD2=$REPO/parity_runs/exp2_full
stage2() {
  local name=$1; shift
  preflight "$name" || exit 1
  bash "$STAGE" "$name" "$WD2" "$@" || { echo "stage $name FAILED"; exit 1; }
  sleep 150
}
rm -f "$WD2/outputs/mnist_svhn/evaluation_results.json"
stage2 smc_exp2_c1 python -m $CLI.evaluate_mnist_svhn \
    --guidance_methods smc \
    --guidance_strengths 1.0 2.0 5.0 --smc_churn 1.0 \
    --num_samples 512 --dtype bf16 --fid
cp "$WD2/outputs/mnist_svhn/evaluation_results.json" \
   "$OUT/exp2_smc_churn1.json" \
  && echo "saved $OUT/exp2_smc_churn1.json"

echo "QUEUE_R4SMC3 DONE"
