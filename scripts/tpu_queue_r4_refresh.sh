#!/bin/bash
# Round-4 study: mid-trajectory MC refresh (--mc_refresh, sample/guided.py)
# on the exp-1 full-budget stack (parity_runs/exp1_full, rebuilt by
# tpu_queue_r4_final.sh §A). Controls (same stack, default chunked eval):
# unguided 0.105/FID 91; mc_feng gamma=1 0.824/218, gamma=2 0.861/267,
# gamma=5 0.885/376 (docs/results_r4/exp1_full_budget_eval_r4.json).
#   H1. refresh=2, gamma 1/2        -> mc_refresh2_eval.json
#   H2. refresh=4, gamma 1/2/5      -> mc_refresh4_eval.json
#   H3. refresh=4 x 4 chunks, g=2   -> mc_refresh4_chunked.json
# All evals 512 samples, bf16, --fid, default flags otherwise.
# Waits for the r4_ema2 queue (which itself waits on r4_final).
set -u
cd "$(dirname "$0")/.."
REPO=$(pwd)
export PYTHONPATH=$REPO:${PYTHONPATH:-}
echo $$ > /tmp/tpu_queue_r4refresh.pid
WD1=$REPO/parity_runs/exp1_full
STAGE=$REPO/scripts/tpu_run_stage.sh
CLI=ratio_guided_multimodal_fm_tpu.cli
OUT=$REPO/docs/results_r4
mkdir -p "$OUT"

for PF in /tmp/tpu_queue_r4final.pid /tmp/tpu_queue_r4ema2.pid; do
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

# ---------- H1. refresh=2 ----------
rm -f "$WD1/outputs/evaluation_results.json"
stage h1_refresh2 "$WD1" python -m $CLI.evaluate \
    --transform_type rotate90 --guidance_methods mc_feng \
    --guidance_strengths 1.0 2.0 --mc_refresh 2 \
    --num_samples 512 --dtype bf16 --fid
cp "$WD1/outputs/evaluation_results.json" "$OUT/mc_refresh2_eval.json" \
  && echo "saved $OUT/mc_refresh2_eval.json"

# ---------- H2. refresh=4 ----------
rm -f "$WD1/outputs/evaluation_results.json"
stage h2_refresh4 "$WD1" python -m $CLI.evaluate \
    --transform_type rotate90 --guidance_methods mc_feng \
    --guidance_strengths 1.0 2.0 5.0 --mc_refresh 4 \
    --num_samples 512 --dtype bf16 --fid
cp "$WD1/outputs/evaluation_results.json" "$OUT/mc_refresh4_eval.json" \
  && echo "saved $OUT/mc_refresh4_eval.json"

# ---------- H3. refresh=4 composed with 4 chunks ----------
rm -f "$WD1/outputs/evaluation_results.json"
stage h3_refresh4_chunked "$WD1" python -m $CLI.evaluate \
    --transform_type rotate90 --guidance_methods mc_feng \
    --guidance_strengths 2.0 --mc_refresh 4 --eval_chunks 4 \
    --num_samples 512 --dtype bf16 --fid
cp "$WD1/outputs/evaluation_results.json" "$OUT/mc_refresh4_chunked.json" \
  && echo "saved $OUT/mc_refresh4_chunked.json"
echo "QUEUE_R4REFRESH DONE"
