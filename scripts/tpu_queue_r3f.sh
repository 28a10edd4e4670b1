#!/bin/bash
# Round-3f: complete the exp-1 transforms coverage sweep from a FRESH
# checkout. The workspace lost its gitignored state (parity_runs/, data/)
# between sessions; the synthetic dataset regenerates deterministically
# (data/sources.py seeds 0/1), so retraining reproduces the same frozen
# data the rotate180 row used. Stages:
#   prep: shared FM_x (12 epochs, quality protocol) + MNIST-28 classifier
#   per transform in {rotate270, flip_h, flip_v, invert}:
#     FM_y 12 epochs -> disc ratio 8 epochs -> default-flag eval sweep
#     (fresh-MC-chunk default, FID, label entropy)
#     -> docs/results_r3/transform_<T>.json
# rotate90 has the full parity/quality runs; rotate180 was recorded by
# the first transforms_sweep run (docs/results_r3/transform_rotate180.json).
#
# Every python stage runs under tpu_run_stage.sh, which detects the axon
# tunnel's permanent-futex wedge (zero CPU+IO progress) and retries the
# stage — preflight + lazy-release sleeps alone proved insufficient today.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
echo $$ > /tmp/tpu_queue_r3f.pid

RUN=$(pwd)/parity_runs/transforms_r3
STAGE=$(pwd)/scripts/tpu_run_stage.sh
mkdir -p "$RUN/checkpoints"

preflight() {
  # Verify the chip answers, then wait out the preflight client's own
  # lazy claim release (~60-120s) before the real job starts.
  for i in $(seq 1 30); do
    if timeout 90 python -c "import jax,jax.numpy as jnp; (jnp.ones((8,8))@jnp.ones((8,8))).block_until_ready()" >/dev/null 2>&1; then
      echo "preflight ok ($1); waiting out lazy chip release"; sleep 150; return 0
    fi
    echo "preflight retry $i ($1)"; sleep 30
  done
  echo "preflight FAILED ($1)"; return 1
}

echo "=== prep: FM_x ==="
preflight "fm_x" || exit 1
bash "$STAGE" fm_x "$RUN" python -m ratio_guided_multimodal_fm_tpu.cli.train_flow \
    --modality x --epochs 12 --dtype bf16 --no_prefetch --data_root /root/repo/data \
  || { echo "FM_x FAILED"; exit 1; }

sleep 150
echo "=== prep: classifier ==="
preflight "classifier" || exit 1
bash "$STAGE" classifier "$RUN" python -m ratio_guided_multimodal_fm_tpu.cli.train_classifier \
    --dtype bf16 --data_root /root/repo/data \
  || { echo "classifier FAILED"; exit 1; }

for T in rotate270 flip_h flip_v invert; do
  sleep 150   # lazy chip release between stages (CLAUDE.md)
  echo "=== transform $T: FM_y ==="
  preflight "fm_$T" || exit 1
  bash "$STAGE" "fm_$T" "$RUN" python -m ratio_guided_multimodal_fm_tpu.cli.train_flow \
      --modality y --transform_type "$T" --epochs 12 --dtype bf16 --no_prefetch --data_root /root/repo/data \
    || { echo "FM_y $T FAILED"; exit 1; }

  sleep 150
  echo "=== transform $T: ratio ==="
  preflight "ratio_$T" || exit 1
  bash "$STAGE" "ratio_$T" "$RUN" python -m ratio_guided_multimodal_fm_tpu.cli.train_ratio \
      --loss_type disc --transform_type "$T" --epochs 8 --dtype bf16 --no_prefetch --data_root /root/repo/data \
    || { echo "ratio $T FAILED"; exit 1; }

  sleep 150
  echo "=== transform $T: eval ==="
  preflight "eval_$T" || exit 1
  rm -f "$RUN/outputs/evaluation_results.json"
  bash "$STAGE" "eval_$T" "$RUN" python -m ratio_guided_multimodal_fm_tpu.cli.evaluate \
      --transform_type "$T" --num_samples 512 --mc_batch_size 256 \
      --num_steps 100 --dtype bf16 --fid \
      --guidance_methods none mc_feng --guidance_strengths 0 0.5 1.0 --data_root /root/repo/data \
    || { echo "eval $T FAILED"; exit 1; }
  cp "$RUN/outputs/evaluation_results.json" \
     "docs/results_r3/transform_${T}.json" && echo "$T saved"
done
echo "QUEUE_R3F DONE"
