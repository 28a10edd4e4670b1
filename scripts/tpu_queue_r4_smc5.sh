#!/bin/bash
# Round-4 TPU queue, part 6: harden the SMC story.
#   stage 1-2: seed error bars on the champion config (gamma=2,
#              churn=1.0, island-16, euler-100) — round 3 showed ±0.02-0.04
#              seed noise on coherence at n=512; the 0.773 headline and the
#              default-churn decision should carry bars.
#   stage 3:   few-step composition — round 3 found --time_grid early is
#              what guided few-step sampling needs below ~12 NFE-per-eval
#              budgets (mc_feng midpoint-6 early: +0.010). Does it compose
#              with SMC at midpoint-12 (control: 0.701 uniform)?
#   stage 4:   exp-2 completion row — gamma=5 at churn=1.0 (have 1.0/2.0:
#              0.600/0.621); does the gamma curve keep rising cross-modal?
# All 512 samples, default flags unless shown.
set -u
cd "$(dirname "$0")/.."
REPO=$(pwd)
export PYTHONPATH=$REPO:${PYTHONPATH:-}
echo $$ > /tmp/tpu_queue_r4smc5.pid
WD1=$REPO/parity_runs/exp1_full
WD2=$REPO/parity_runs/exp2_full
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
  local name=$1 wd=$2; shift 2
  preflight "$name" || exit 1
  bash "$STAGE" "$name" "$wd" "$@" || { echo "stage $name FAILED"; exit 1; }
  sleep 150
}

for SEED in 7 1234; do
  rm -f "$WD1/outputs/evaluation_results.json"
  stage smc_seed$SEED "$WD1" python -m $CLI.evaluate \
      --transform_type rotate90 --guidance_methods smc \
      --guidance_strengths 2.0 --seed $SEED \
      --num_samples 512 --dtype bf16 --fid
  cp "$WD1/outputs/evaluation_results.json" \
     "$OUT/smc_champion_seed$SEED.json" \
    && echo "saved $OUT/smc_champion_seed$SEED.json"
done

rm -f "$WD1/outputs/evaluation_results.json"
stage smc_mp12_early "$WD1" python -m $CLI.evaluate \
    --transform_type rotate90 --guidance_methods smc \
    --guidance_strengths 2.0 --solver midpoint --num_steps 12 \
    --time_grid early \
    --num_samples 512 --dtype bf16 --fid
cp "$WD1/outputs/evaluation_results.json" \
   "$OUT/smc_mp12_early.json" \
  && echo "saved $OUT/smc_mp12_early.json"

rm -f "$WD2/outputs/mnist_svhn/evaluation_results.json"
stage exp2_smc_g5 "$WD2" python -m $CLI.evaluate_mnist_svhn \
    --guidance_methods smc --guidance_strengths 5.0 \
    --num_samples 512 --dtype bf16 --fid
cp "$WD2/outputs/mnist_svhn/evaluation_results.json" \
   "$OUT/exp2_smc_churn1_g5.json" \
  && echo "saved $OUT/exp2_smc_churn1_g5.json"

echo "QUEUE_R4SMC5 DONE"
