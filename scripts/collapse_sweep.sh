#!/bin/bash
# Weight-collapse mitigation sweep (VERDICT r1 item 2).
#
# Recreates the round-1 brittle regime — 30-epoch flows + 12-epoch ratio on
# the frozen synthetic IDX digits — where mc_feng importance weights
# collapse (ESS→1) and guided coherence degenerated to ~0 at gamma>=0.5.
# Then evaluates three policies at gamma in {0, 0.5, 1.0}:
#   baseline      (reference parity, no mitigation)
#   ratio_clip=4  (|log r| clip, round-1 soft mitigation)
#   ess_floor=16  (round-2 adaptive gamma: gamma_eff = gamma*min(1,ESS/16))
# Artifacts land in parity_runs/collapse/outputs/*; merge with
# scripts/merge_collapse_sweep.py -> docs/results_r2/collapse_sweep.json.
set -e
cd /root/repo
export PYTHONPATH="/root/repo:$PYTHONPATH"
W=parity_runs/collapse
mkdir -p $W
preflight() {
  for i in $(seq 1 20); do
    if timeout 60 python -c "import jax,jax.numpy as jnp; (jnp.ones((8,8))@jnp.ones((8,8))).block_until_ready()" 2>/dev/null; then
      echo "[preflight] TPU ok (attempt $i)"; return 0
    fi
    echo "[preflight] TPU busy, retry $i"; sleep 30
  done
  echo "[preflight] TPU never came back"; return 1
}
run() { name=$1; shift; preflight || exit 1; echo "=== $name ==="; (cd $W && "$@" 2>&1 | grep -vE "WARNING" | tail -4); }

P="python -m ratio_guided_multimodal_fm_tpu.cli"
D="--data_root /root/repo/data"
[ -d $W/checkpoints/mnist_classifier ] || run cls $P.train_classifier --epochs 3 --seed 42 $D
[ -d $W/checkpoints/flow_x_best ] || run fm_x $P.train_flow --modality x --epochs 30 --seed 42 $D
[ -d $W/checkpoints/flow_y_rotate90_best ] || run fm_y $P.train_flow --modality y --transform_type rotate90 --epochs 30 --seed 42 $D
[ -d $W/checkpoints/ratio_disc_rotate90_best ] || run ratio $P.train_ratio --loss_type disc --transform_type rotate90 --epochs 12 --seed 42 $D

EV="$P.evaluate --transform_type rotate90 --guidance_methods none mc_feng --guidance_strengths 0.0 0.5 1.0 --num_samples 512 --num_steps 100 --mc_batch_size 256 --seed 1234 $D"
run eval_baseline $EV
mv $W/outputs/evaluation_results.json $W/outputs/eval_baseline.json
run eval_clip $EV --ratio_clip 4.0
mv $W/outputs/evaluation_results.json $W/outputs/eval_ratio_clip4.json
run eval_essfloor $EV --ess_floor 16
mv $W/outputs/evaluation_results.json $W/outputs/eval_ess_floor16.json
python scripts/merge_collapse_sweep.py
echo "=== COLLAPSE SWEEP DONE ==="
