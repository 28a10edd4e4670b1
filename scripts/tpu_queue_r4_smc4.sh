#!/bin/bash
# Round-4 TPU queue, part 4: FEW-STEP SMC via extra Langevin mixing.
# Hypothesis (from the churn ablation + the midpoint-12 0.537 result):
# at few ODE steps SMC is mixing-limited, not integration-limited —
# the particles get too few Langevin moves between selections to
# decorrelate clones and re-rank. --smc_churn_iters k adds k-1 pure
# marginal-preserving Langevin iterations at t+dt per step (2 extra
# U-Net evals each), buying mixing back at few steps.
#   stage 1: midpoint-12, churn=1.0, iters=1 (control at the new churn)
#   stage 2: midpoint-12, churn=1.0, iters=2   (36 evals/modality)
#   stage 3: midpoint-12, churn=1.0, iters=4   (60 evals/modality)
# All exp-1 full-budget stack, gamma=2, 512 samples, default islands.
set -u
cd "$(dirname "$0")/.."
REPO=$(pwd)
export PYTHONPATH=$REPO:${PYTHONPATH:-}
echo $$ > /tmp/tpu_queue_r4smc4.pid
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

for IT in 1 2 4; do
  rm -f "$WD/outputs/evaluation_results.json"
  stage smc_mp12_it$IT python -m $CLI.evaluate \
      --transform_type rotate90 --guidance_methods smc \
      --guidance_strengths 2.0 --smc_churn 1.0 --smc_churn_iters $IT \
      --solver midpoint --num_steps 12 \
      --num_samples 512 --dtype bf16 --fid
  cp "$WD/outputs/evaluation_results.json" \
     "$OUT/smc_mp12_churn1_iters$IT.json" \
    && echo "saved $OUT/smc_mp12_churn1_iters$IT.json"
done

echo "QUEUE_R4SMC4 DONE"
