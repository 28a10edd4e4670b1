#!/bin/bash
cd /root/repo
preflight() {
  for i in $(seq 1 20); do
    if timeout 60 python -c "import jax,jax.numpy as jnp; (jnp.ones((8,8))@jnp.ones((8,8))).block_until_ready()" 2>/dev/null; then
      echo "[preflight] TPU ok"; return 0
    fi
    echo "[preflight] retry $i"; sleep 30
  done
  return 1
}
run() { name=$1; shift; preflight || exit 1; echo "=== $name ==="; "$@" 2>&1 | grep -vE "WARNING" | tail -5; }
run clf   python -m ratio_guided_multimodal_fm_tpu.cli.train_classifiers_mnist_svhn --epochs 5
run fm_m  python -m ratio_guided_multimodal_fm_tpu.cli.train_flow_mnist32 --epochs 12
run fm_s  python -m ratio_guided_multimodal_fm_tpu.cli.train_flow_svhn --epochs 12
run ratio python -m ratio_guided_multimodal_fm_tpu.cli.train_ratio_mnist_svhn --epochs 8
run eval  python -m ratio_guided_multimodal_fm_tpu.cli.evaluate_mnist_svhn --guidance_methods none mc_feng grad --guidance_strengths 0.0 0.3 0.5 1.0 --num_samples 256 --num_steps 100 --mc_batch_size 256 --fid
run sampl python -m ratio_guided_multimodal_fm_tpu.cli.sample_mnist_svhn --guidance_method mc_feng --guidance_strength 0.5 --num_samples 32
echo "=== ALL DONE ==="
