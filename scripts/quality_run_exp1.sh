#!/bin/bash
cd /root/repo
preflight() {
  for i in $(seq 1 20); do
    if timeout 60 python -c "import jax,jax.numpy as jnp; (jnp.ones((8,8))@jnp.ones((8,8))).block_until_ready()" 2>/dev/null; then
      echo "[preflight] TPU ok (attempt $i)"; return 0
    fi
    echo "[preflight] TPU busy, retry $i"; sleep 30
  done
  echo "[preflight] TPU never came back"; return 1
}
run() { name=$1; shift; preflight || exit 1; echo "=== $name ==="; "$@" 2>&1 | grep -vE "WARNING" | tail -5; }
run fm_x  python -m ratio_guided_multimodal_fm_tpu.cli.train_flow --modality x --epochs 12
run fm_y  python -m ratio_guided_multimodal_fm_tpu.cli.train_flow --modality y --transform_type rotate90 --epochs 12
run ratio python -m ratio_guided_multimodal_fm_tpu.cli.train_ratio --epochs 8 --transform_type rotate90
run eval  python -m ratio_guided_multimodal_fm_tpu.cli.evaluate --transform_type rotate90 --guidance_methods none mc_feng grad --guidance_strengths 0.0 0.3 0.5 1.0 --num_samples 256 --num_steps 100 --mc_batch_size 256 --fid
echo "=== ALL DONE ==="
