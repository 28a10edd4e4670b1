#!/bin/bash
# Round-5 queue M: --fast_rng quality validation. The flag changes the
# PRNG stream (rbg vs threefry) — statistically a seed change, but the
# round-4 verdict's standard is that shipped knobs carry measured
# quality numbers. Train the full exp-1 stack under --fast_rng and run
# the reference mc_feng eval; controls are the round-4 full-budget
# numbers (coherence 0.824/0.861, FID 218/267 at gamma 1/2) and the
# seed-variance bars (0.748-0.785 across seeds, 33d8378).
set -u
cd "$(dirname "$0")/.."
REPO=$(pwd)
export PYTHONPATH=$REPO:${PYTHONPATH:-}
source "$REPO/scripts/tpu_stage_lib.sh"
echo $$ > /tmp/tpu_queue_r5m.pid

WD=$REPO/parity_runs/exp1_rng
CLI=ratio_guided_multimodal_fm_tpu.cli
OUT=$REPO/docs/results_r5
mkdir -p "$WD/checkpoints" "$OUT"

wait_queue /tmp/tpu_queue_r5l.pid

# reuse the eval classifier from the rebuilt exp-1 stack (not part of
# the knob under test)
if [ ! -d "$WD/checkpoints/mnist_classifier" ]; then
  cp -r "$REPO/parity_runs/exp1_full/checkpoints/mnist_classifier" \
        "$WD/checkpoints/mnist_classifier"
fi
if [ ! -d "$WD/checkpoints/flow_x_best" ]; then
  stage m1_flow_x "$WD" python -m $CLI.train_flow --modality x \
      --dtype bf16 --fast_rng
fi
if [ ! -d "$WD/checkpoints/flow_y_rotate90_best" ]; then
  stage m2_flow_y "$WD" python -m $CLI.train_flow --modality y \
      --transform_type rotate90 --dtype bf16 --fast_rng
fi
if [ ! -d "$WD/checkpoints/ratio_disc_rotate90_best" ]; then
  stage m3_ratio "$WD" python -m $CLI.train_ratio --loss_type disc \
      --transform_type rotate90 --dtype bf16 --fast_rng
fi
if [ ! -f "$OUT/exp1_fastrng_eval.json" ]; then
  rm -f "$WD/outputs/evaluation_results.json"
  stage m4_eval "$WD" python -m $CLI.evaluate \
      --transform_type rotate90 --guidance_methods mc_feng \
      --guidance_strengths 1.0 2.0 \
      --num_samples 512 --dtype bf16 --fid
  cp "$WD/outputs/evaluation_results.json" \
     "$OUT/exp1_fastrng_eval.json" \
    && echo "saved $OUT/exp1_fastrng_eval.json"
fi

track_results "Round-5 queue M: --fast_rng quality validation (full exp-1 stack)" \
  "$OUT/exp1_fastrng_eval.json"
echo "QUEUE_R5M DONE"
