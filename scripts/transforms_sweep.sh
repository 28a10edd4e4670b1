#!/bin/bash
# Exp-1 coverage sweep: train + evaluate ALL remaining transform types
# (rotate90 already has the parity/quality runs). Per transform:
#   FM_y 12 epochs + disc ratio 8 epochs (round-1 quality protocol),
#   then the default-flag eval sweep (fresh-MC-chunk default, FID,
#   label entropy) -> docs/results_r3/transform_<T>.json
# FM_x and the eval classifier are shared across transforms (symlinked
# from the parity_runs/jax training on the same frozen synthetic data).
set -u
cd "$(dirname "$0")/.."
REPO=$(pwd)
export PYTHONPATH=$REPO:${PYTHONPATH:-}
echo $$ > /tmp/transforms_sweep.pid

RUN=parity_runs/transforms_r3
mkdir -p $RUN/checkpoints
ln -sfn ../../jax/checkpoints/flow_x_best $RUN/checkpoints/flow_x_best
ln -sfn ../../jax/checkpoints/mnist_classifier $RUN/checkpoints/mnist_classifier

preflight() {
  for i in $(seq 1 30); do
    if timeout 60 python -c "import jax,jax.numpy as jnp; (jnp.ones((8,8))@jnp.ones((8,8))).block_until_ready()" >/dev/null 2>&1; then
      echo "preflight ok ($1)"; return 0
    fi
    echo "preflight retry $i ($1)"; sleep 30
  done
  echo "preflight FAILED ($1)"; return 1
}

first=1
for T in rotate180 rotate270 flip_h flip_v invert; do
  if [ $first -eq 0 ]; then sleep 150; fi   # lazy chip release (CLAUDE.md)
  first=0
  echo "=== transform $T: FM_y ==="
  preflight "fm_$T" || exit 1
  (cd $RUN && stdbuf -oL python -m ratio_guided_multimodal_fm_tpu.cli.train_flow \
      --modality y --transform_type $T --epochs 12 --dtype bf16 --data_root /root/repo/data) \
    || { echo "FM_y $T FAILED"; exit 1; }

  sleep 150
  echo "=== transform $T: ratio ==="
  preflight "ratio_$T" || exit 1
  (cd $RUN && stdbuf -oL python -m ratio_guided_multimodal_fm_tpu.cli.train_ratio \
      --loss_type disc --transform_type $T --epochs 8 --dtype bf16 --data_root /root/repo/data) \
    || { echo "ratio $T FAILED"; exit 1; }

  sleep 150
  echo "=== transform $T: eval ==="
  preflight "eval_$T" || exit 1
  rm -f $RUN/outputs/evaluation_results.json
  (cd $RUN && stdbuf -oL python -m ratio_guided_multimodal_fm_tpu.cli.evaluate \
      --transform_type $T --num_samples 512 --mc_batch_size 256 \
      --num_steps 100 --dtype bf16 --fid \
      --guidance_methods none mc_feng --guidance_strengths 0 0.5 1.0 --data_root /root/repo/data) \
    || { echo "eval $T FAILED"; exit 1; }
  cp $RUN/outputs/evaluation_results.json \
     "docs/results_r3/transform_${T}.json" && echo "$T saved"
done
echo "TRANSFORMS_SWEEP DONE"
