#!/bin/bash
# Coherence-vs-diversity frontier (VERDICT r2 #3): N_mc x gamma sweep on the
# round-2 MNIST-SVHN checkpoints, classifier-FID + label entropy standard.
#
# Protocol: single shared MC set per config (--eval_chunks 1) so N_mc is the
# only variable, plus one default-policy row (chunked 4x256 = 1024 fresh
# candidates) to place the shipping default on the frontier.
#
# Run on TPU:  bash scripts/frontier_sweep.sh
# Results  ->  docs/results_r3/frontier_nmc{N}.json
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

run_eval() {
  sleep 150   # lazy chip release after the previous stage (CLAUDE.md)  # $1=nmc $2=chunks $3=outname
  preflight
  (cd "$RUN" && stdbuf -oL python -m ratio_guided_multimodal_fm_tpu.cli.evaluate_mnist_svhn \
      --num_samples 512 --mc_batch_size "$1" --eval_chunks "$2" \
      --guidance_methods none mc_feng --guidance_strengths 0 0.5 1 2 5 \
      --dtype bf16 --fid)
  cp "$RUN/outputs/mnist_svhn/evaluation_results.json" \
     "docs/results_r3/$3"
  echo "saved docs/results_r3/$3"
}

mkdir -p docs/results_r3
run_eval 256 1 frontier_nmc256.json
run_eval 1024 1 frontier_nmc1024.json
run_eval 4096 1 frontier_nmc4096.json
run_eval 256 4 frontier_default_chunked.json
echo "FRONTIER SWEEP DONE"
