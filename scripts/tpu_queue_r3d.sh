#!/bin/bash
# Round-3d TPU queue (runs AFTER tpu_queue_r3c): saturated default-flag
# eval at TRUE defaults (f32 — the prior "default-flag" runs passed
# --dtype bf16, which is not the default). Hypothesis: round-2's 0.365 at
# gamma=1 (seed 1234, f32) vs round-3's 0.281 (seed 1234, bf16) is the
# activation dtype, not seed luck or code drift.
set -u
cd "$(dirname "$0")/.."
REPO=$(pwd)
export PYTHONPATH=$REPO:${PYTHONPATH:-}
echo $$ > /tmp/tpu_queue_r3d.pid   # queue handshake: successors wait on this PID

if [ -f /tmp/tpu_queue_r3c.pid ]; then
  PID=$(cat /tmp/tpu_queue_r3c.pid)
  while kill -0 "$PID" 2>/dev/null; do sleep 20; done
  echo "r3c queue exited; waiting for chip release"; sleep 150
fi

preflight() {
  for i in $(seq 1 30); do
    if timeout 60 python -c "import jax,jax.numpy as jnp; (jnp.ones((8,8))@jnp.ones((8,8))).block_until_ready()" >/dev/null 2>&1; then
      echo "preflight ok ($1)"; return 0
    fi
    echo "preflight retry $i ($1)"; sleep 30
  done
  echo "preflight FAILED ($1)"; return 1
}

for SEED in 1234 42; do
  echo "=== saturated TRUE-default (f32) eval, seed $SEED ==="
  sleep 150   # lazy chip release after the previous stage (CLAUDE.md)
  preflight "f32seed$SEED" || exit 1
  rm -f parity_runs/saturated_r3/outputs/evaluation_results.json
  (cd parity_runs/saturated_r3 && stdbuf -oL python -m ratio_guided_multimodal_fm_tpu.cli.evaluate \
      --num_samples 512 --mc_batch_size 256 --num_steps 100 \
      --seed $SEED \
      --guidance_methods none mc_feng --guidance_strengths 0 0.5 1.0) \
    || { echo "f32 seed $SEED eval FAILED"; exit 1; }
  cp parity_runs/saturated_r3/outputs/evaluation_results.json \
     "docs/results_r3/saturated_f32_eval_seed${SEED}.json" \
     && echo "f32 seed $SEED saved"
done
echo "QUEUE_R3D DONE"
