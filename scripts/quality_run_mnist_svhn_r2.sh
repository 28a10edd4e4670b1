#!/bin/bash
# Round-2 MNIST-SVHN quality sweep — BASELINE.json config #4 verbatim:
# guidance strengths 0/0.5/1/2/5, classifier coherence + FID, both guidance
# methods (mc_feng + the README-promised grad), plus sample grids.
# Artifacts: parity_runs/mnist_svhn_r2/outputs/* -> docs/results_r2/.
set -e
cd /root/repo
export PYTHONPATH="/root/repo:$PYTHONPATH"
W=parity_runs/mnist_svhn_r2
mkdir -p $W
preflight() {
  for i in $(seq 1 30); do
    if timeout 60 python -c "import jax,jax.numpy as jnp; (jnp.ones((8,8))@jnp.ones((8,8))).block_until_ready()" 2>/dev/null; then
      echo "[preflight] TPU ok (attempt $i)"; return 0
    fi
    echo "[preflight] TPU busy, retry $i"; sleep 30
  done
  echo "[preflight] TPU never came back"; return 1
}
run() { name=$1; shift; preflight || exit 1; echo "=== $name ==="; (cd $W && "$@" 2>&1 | grep -vE "WARNING" | tail -4); }

P="python -m ratio_guided_multimodal_fm_tpu.cli"
D="--data_root /root/repo/data --seed 42"
[ -d $W/checkpoints/mnist32_classifier ] || run clf $P.train_classifiers_mnist_svhn --epochs 5 $D
[ -d $W/checkpoints/flow_mnist32_best ] || run fm_m $P.train_flow_mnist32 --epochs 20 $D
[ -d $W/checkpoints/flow_svhn_best ] || run fm_s $P.train_flow_svhn --epochs 20 $D
[ -d $W/checkpoints/ratio_disc_mnist_svhn_best ] || run ratio $P.train_ratio_mnist_svhn --epochs 12 $D

run eval $P.evaluate_mnist_svhn \
  --guidance_methods none mc_feng grad \
  --guidance_strengths 0.0 0.5 1.0 2.0 5.0 \
  --num_samples 512 --num_steps 100 --mc_batch_size 256 --fid $D
run grid $P.sample_mnist_svhn --guidance_method mc_feng \
  --guidance_strength 1.0 --num_samples 64 --num_steps 100 $D

cp $W/outputs/mnist_svhn/evaluation_results.json \
   docs/results_r2/mnist_svhn_sweep.json
cp $W/outputs/mnist_svhn/*.png docs/results_r2/ 2>/dev/null || true
echo "=== MNIST_SVHN R2 DONE ==="
