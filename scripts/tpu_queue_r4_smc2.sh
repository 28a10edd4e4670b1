#!/bin/bash
# Round-4 TPU queue, part 2: ISLAND-mode SMC study on the exp-1 stack.
# Runs after tpu_queue_r4_smc.sh (whose gamma sweep measured the GLOBAL
# population mode and found the genealogical class-collapse that
# motivated stratified selection — sample/smc.py:resample_group).
#
#   1. island gamma sweep (G=16 default): gamma 0.5/1/2/5
#   2. group-size ablation at gamma=2: G in {8, 64}
set -u
cd "$(dirname "$0")/.."
REPO=$(pwd)
export PYTHONPATH=$REPO:${PYTHONPATH:-}
echo $$ > /tmp/tpu_queue_r4smc2.pid
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
stage smc_island_gamma python -m $CLI.evaluate \
    --transform_type rotate90 --guidance_methods smc \
    --guidance_strengths 0.5 1.0 2.0 5.0 \
    --num_samples 512 --dtype bf16 --fid
cp "$WD/outputs/evaluation_results.json" "$OUT/smc_island_gamma_sweep.json" \
  && echo "saved $OUT/smc_island_gamma_sweep.json"

for G in 8 64; do
  rm -f "$WD/outputs/evaluation_results.json"
  stage smc_g$G python -m $CLI.evaluate \
      --transform_type rotate90 --guidance_methods smc \
      --guidance_strengths 2.0 --smc_group $G \
      --num_samples 512 --dtype bf16 --fid
  cp "$WD/outputs/evaluation_results.json" "$OUT/smc_group$G.json" \
    && echo "saved $OUT/smc_group$G.json"
done

echo "QUEUE_R4SMC2 DONE"
