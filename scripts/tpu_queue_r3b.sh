#!/bin/bash
# Round-3b TPU queue:
#   1. merged-pair exp-1 sampler timing       (scripts/merged_experiment.py)
#   2. saturated default-flag eval, 3 seeds   (seed-variance: round-2's
#      0.365 at gamma=1 used --seed 1234; the round-3 default-flag run used
#      seed 42 and got 0.264 — quantify the spread before judging the
#      VERDICT #2 done-criterion)
# One stage at a time; each stage preflights (single-chip discipline).
set -u
cd "$(dirname "$0")/.."
REPO=$(pwd)
export PYTHONPATH=$REPO:${PYTHONPATH:-}
echo $$ > /tmp/tpu_queue_r3b.pid   # queue handshake: successors wait on this PID

preflight() {
  for i in $(seq 1 30); do
    if timeout 60 python -c "import jax,jax.numpy as jnp; (jnp.ones((8,8))@jnp.ones((8,8))).block_until_ready()" >/dev/null 2>&1; then
      echo "preflight ok ($1)"; return 0
    fi
    echo "preflight retry $i ($1)"; sleep 30
  done
  echo "preflight FAILED ($1)"; return 1
}

echo "=== stage 1: merged-pair exp-1 timing ==="
preflight stage1 || exit 1
stdbuf -oL python scripts/merged_experiment.py

for SEED in 1234 7 99; do
  echo "=== stage 2: saturated default-flag eval, seed $SEED ==="
  sleep 150   # lazy chip release after the previous stage (CLAUDE.md)
  preflight "seed$SEED" || exit 1
  rm -f parity_runs/saturated_r3/outputs/evaluation_results.json
  (cd parity_runs/saturated_r3 && stdbuf -oL python -m ratio_guided_multimodal_fm_tpu.cli.evaluate \
      --num_samples 512 --mc_batch_size 256 --num_steps 100 --dtype bf16 \
      --seed $SEED \
      --guidance_methods none mc_feng --guidance_strengths 0 0.5 1.0) \
    || { echo "seed $SEED eval FAILED"; exit 1; }
  cp parity_runs/saturated_r3/outputs/evaluation_results.json \
     "docs/results_r3/saturated_default_eval_seed${SEED}.json" \
     && echo "seed $SEED saved"
done
echo "QUEUE_R3B DONE"
