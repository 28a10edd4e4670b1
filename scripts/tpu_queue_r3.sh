#!/bin/bash
# Round-3 TPU evaluation queue (run AFTER the config5 job exits):
#   1. saturated-regime DEFAULT-FLAG validation (VERDICT r2 #2 done-criterion)
#   2. N_mc x gamma frontier sweep           (VERDICT r2 #3)
#   3. grad tune-or-retire sweep             (VERDICT r2 #7)
#   4. prefetch train-throughput measurement (VERDICT r2 #6)
#   5. bench.py headline sanity
# One stage at a time; each stage preflights (single-chip discipline).
set -u
cd "$(dirname "$0")/.."
REPO=$(pwd)
export PYTHONPATH=$REPO:${PYTHONPATH:-}

preflight() {
  for i in $(seq 1 30); do
    if timeout 60 python -c "import jax,jax.numpy as jnp; (jnp.ones((8,8))@jnp.ones((8,8))).block_until_ready()" >/dev/null 2>&1; then
      echo "preflight ok ($1)"; return 0
    fi
    echo "preflight retry $i ($1)"; sleep 30
  done
  echo "preflight FAILED ($1)"; return 1
}

echo "=== stage 1: saturated-regime default-flag eval ==="
preflight stage1 || exit 1
(cd parity_runs/saturated_r3 && stdbuf -oL python -m ratio_guided_multimodal_fm_tpu.cli.evaluate \
    --num_samples 512 --mc_batch_size 256 --num_steps 100 --dtype bf16 \
    --guidance_methods none mc_feng --guidance_strengths 0 0.5 1.0)
cp parity_runs/saturated_r3/outputs/evaluation_results.json \
   docs/results_r3/saturated_default_eval.json && echo "stage 1 saved"

sleep 150   # lazy chip release (CLAUDE.md)
echo "=== stage 1b: best-point (10-epoch ratio) default-flag eval ==="
preflight stage1b || exit 1
(cd parity_runs/best10_r3 && stdbuf -oL python -m ratio_guided_multimodal_fm_tpu.cli.evaluate     --num_samples 512 --mc_batch_size 256 --num_steps 100 --dtype bf16     --guidance_methods none mc_feng --guidance_strengths 0 0.5 1.0)
cp parity_runs/best10_r3/outputs/evaluation_results.json    docs/results_r3/best10_default_eval.json && echo "stage 1b saved"

sleep 150
echo "=== stage 2: frontier sweep ==="
bash scripts/frontier_sweep.sh

sleep 150
echo "=== stage 3: grad sweep ==="
bash scripts/grad_sweep.sh

sleep 150
echo "=== stage 4: prefetch bench ==="
preflight stage4 || exit 1
stdbuf -oL python scripts/prefetch_bench.py

sleep 150
echo "=== stage 5: bench headline ==="
preflight stage5 || exit 1
stdbuf -oL python bench.py
echo "QUEUE DONE"
