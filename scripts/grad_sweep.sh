#!/bin/bash
# Grad-guidance tune-or-retire sweep (VERDICT r2 #7) on the round-2
# MNIST-SVHN checkpoints. Round 2 measured grad barely positive
# (0.129 -> 0.162 at gamma=5, const scaling, no gating); this sweeps the
# tuning axes the sampler now exposes:
#   1. const scaling, wider strengths        (baseline curve)
#   2. sigma_t^2 scaling (score-SDE style)   needs larger gamma
#   3. early-t gating (t < 0.6)              ratio net is terminal-time-only
#   4. combined mc_feng+grad                 complementary mechanisms
# Results -> docs/results_r3/grad_{const,sigma,tgate,combined}.json
set -u
cd "$(dirname "$0")/.."
REPO=$(pwd)
RUN=parity_runs/mnist_svhn_r2
export PYTHONPATH=$REPO:${PYTHONPATH:-}

preflight() {
  for i in $(seq 1 20); do
    if timeout 60 python -c "import jax,jax.numpy as jnp; (jnp.ones((8,8))@jnp.ones((8,8))).block_until_ready()" >/dev/null 2>&1; then
      echo "preflight ok"; return 0
    fi
    echo "preflight retry $i"; sleep 30
  done
  echo "preflight FAILED"; exit 1
}

run_eval() {  # $1=outname, rest = extra args
  local out=$1; shift
  sleep 150   # lazy chip release after the previous stage (CLAUDE.md)
  preflight
  (cd "$RUN" && stdbuf -oL python -m ratio_guided_multimodal_fm_tpu.cli.evaluate_mnist_svhn \
      --num_samples 512 --mc_batch_size 256 --dtype bf16 --fid "$@")
  cp "$RUN/outputs/mnist_svhn/evaluation_results.json" "docs/results_r3/$out"
  echo "saved docs/results_r3/$out"
}

mkdir -p docs/results_r3
run_eval grad_const.json   --guidance_methods none grad --guidance_strengths 0 2 5 20
run_eval grad_sigma.json   --guidance_methods grad --grad_scale sigma --guidance_strengths 5 20 50
run_eval grad_tgate.json   --guidance_methods grad --grad_t_max 0.6 --guidance_strengths 5 20
run_eval grad_combined.json --guidance_methods mc_feng+grad --guidance_strengths 0.5 1.0 \
    --grad_strength 5 --grad_scale sigma
echo "GRAD SWEEP DONE"
