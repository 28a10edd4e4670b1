#!/bin/bash
# Round-3c TPU queue (runs AFTER tpu_queue_r3b): RuLSIF end-to-end leg.
# The RuLSIF loss has unit tests but no end-to-end quality run anywhere in
# the repo; this trains a rulsif ratio net on the frozen exp-1 parity data
# (same flows/classifier as the saturated_r3 runs, symlinked) and evaluates
# the default-flag coherence sweep with it -> docs/results_r3/rulsif_eval.json
set -u
cd "$(dirname "$0")/.."
REPO=$(pwd)
export PYTHONPATH=$REPO:${PYTHONPATH:-}
echo $$ > /tmp/tpu_queue_r3c.pid   # queue handshake: successors wait on this PID

# queue discipline (CLAUDE.md): wait for the prior queue's PID, then the
# lazy chip release, then preflight.
if [ -f /tmp/tpu_queue_r3b.pid ]; then
  PID=$(cat /tmp/tpu_queue_r3b.pid)
  while kill -0 "$PID" 2>/dev/null; do sleep 20; done
  echo "r3b queue exited; waiting for chip release"; sleep 150
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

echo "=== stage A: train rulsif ratio ==="
preflight stageA || exit 1
(cd parity_runs/rulsif_r3 && stdbuf -oL python -m ratio_guided_multimodal_fm_tpu.cli.train_ratio \
    --loss_type rulsif --transform_type rotate90 --epochs 15 \
    --dtype bf16) || { echo "rulsif training FAILED"; exit 1; }

echo "=== stage B: rulsif eval sweep (default flags) ==="
sleep 150   # lazy chip release after stage A (CLAUDE.md)
preflight stageB || exit 1
rm -f parity_runs/rulsif_r3/outputs/evaluation_results.json
(cd parity_runs/rulsif_r3 && stdbuf -oL python -m ratio_guided_multimodal_fm_tpu.cli.evaluate \
    --loss_type rulsif --num_samples 512 --mc_batch_size 256 \
    --num_steps 100 --dtype bf16 \
    --guidance_methods none mc_feng --guidance_strengths 0 0.5 1.0) \
  || { echo "rulsif eval FAILED"; exit 1; }
cp parity_runs/rulsif_r3/outputs/evaluation_results.json \
   docs/results_r3/rulsif_eval.json && echo "rulsif eval saved"
echo "QUEUE_R3C DONE"
