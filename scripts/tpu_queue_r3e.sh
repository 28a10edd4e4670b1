#!/bin/bash
# Round-3e control: rerun the ROUND-2 evalchunks protocol verbatim with
# TODAY'S code — parity_runs/jax's own ratio_disc_rotate90_best checkpoint
# (what the round-2 run loaded), seed 1234, f32, 4 chunks. Reproduced
# round 2 to the third digit (0.092/0.320/0.369 vs 0.092/0.318/0.365),
# proving the epoch30-vs-best checkpoint identity explains the round-3
# default-flag gap. -> docs/results_r3/saturated_best_ckpt_seed1234.json
set -u
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
for i in $(seq 1 30); do
  if timeout 60 python -c "import jax,jax.numpy as jnp; (jnp.ones((8,8))@jnp.ones((8,8))).block_until_ready()" >/dev/null 2>&1; then echo "preflight ok"; break; fi
  echo "preflight retry $i"; sleep 30
done
(cd parity_runs/jax && stdbuf -oL python -m ratio_guided_multimodal_fm_tpu.cli.evaluate \
    --num_samples 512 --mc_batch_size 256 --num_steps 100 \
    --seed 1234 --eval_chunks 4 \
    --guidance_methods none mc_feng --guidance_strengths 0 0.5 1.0)
cp parity_runs/jax/outputs/evaluation_results.json \
   docs/results_r3/saturated_best_ckpt_seed1234.json && echo "SAVED"
echo "QUEUE_R3E DONE"
