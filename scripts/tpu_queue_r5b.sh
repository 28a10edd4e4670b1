#!/bin/bash
# Round-5 queue B: step-window SMC re-run, exp-2 combo probe, B-sweep
# profiles, and the fused-train bench (VERDICT r4 items 4, 5, 7 + the
# exp-2 gap attack from queue A's island/tau findings).
#
#   B1. exp-1 midpoint-12 early-grid SMC with --smc_resample_window step
#       (controls: t-window early 0.525, uniform 0.701 — smc_mp12_early)
#   B2. exp-2 SMC combo: island-8 + tau 0.7, gamma 2 and 5
#       (queue-A singles: g8 0.674, tau07 0.676 vs control 0.621)
#   B3/B4. profile_sampler at B=256 / B=1024 (diff vs r3's B=512 op
#       table → explain the B=1024 MFU sag)
#   B5. bench.py full run (now includes the fused K-step train sweep
#       that quantifies the dispatch floor)
set -u
cd "$(dirname "$0")/.."
REPO=$(pwd)
export PYTHONPATH=$REPO:${PYTHONPATH:-}
source "$REPO/scripts/tpu_stage_lib.sh"
echo $$ > /tmp/tpu_queue_r5b.pid

WD1=$REPO/parity_runs/exp1_full
WD2=$REPO/parity_runs/exp2_full
CLI=ratio_guided_multimodal_fm_tpu.cli
OUT=$REPO/docs/results_r5
mkdir -p "$OUT"

wait_queue /tmp/tpu_queue_r5a.pid

# ---------- B1. step-window SMC at midpoint-12 early ----------
if [ ! -f "$OUT/smc_mp12_early_stepwin.json" ]; then
  rm -f "$WD1/outputs/evaluation_results.json"
  stage b1_stepwin "$WD1" python -m $CLI.evaluate \
      --transform_type rotate90 --guidance_methods smc \
      --guidance_strengths 2.0 --solver midpoint --num_steps 12 \
      --time_grid early --smc_resample_window step \
      --num_samples 512 --dtype bf16 --fid
  cp "$WD1/outputs/evaluation_results.json" \
     "$OUT/smc_mp12_early_stepwin.json" \
    && echo "saved $OUT/smc_mp12_early_stepwin.json"
fi

# ---------- B2. exp-2 combo: island-8 + tau 0.7 ----------
if [ ! -f "$OUT/exp2_smc_g8tau07.json" ]; then
  rm -f "$WD2/outputs/mnist_svhn/evaluation_results.json"
  stage b2_combo "$WD2" python -m $CLI.evaluate_mnist_svhn \
      --guidance_methods smc --guidance_strengths 2.0 5.0 \
      --smc_group 8 --smc_resample_tau 0.7 \
      --num_samples 512 --dtype bf16 --fid
  cp "$WD2/outputs/mnist_svhn/evaluation_results.json" \
     "$OUT/exp2_smc_g8tau07.json" \
    && echo "saved $OUT/exp2_smc_g8tau07.json"
fi

# ---------- B3/B4. batch-sweep profiles ----------
for B in 256 1024; do
  if [ ! -f "$OUT/profile_B$B.json" ]; then
    stage b3_profile$B "$REPO" python scripts/profile_sampler.py \
        --B $B --out "$OUT/profile_B$B.json" --trace_dir /tmp/r5_trace_$B
  fi
done

# ---------- B5. bench with the fused-train sweep ----------
stage b5_bench "$REPO" python bench.py

track_results "Round-5 queue B results: step-window SMC, exp2 combo, B-sweep profiles, fused-train bench" \
  "$OUT"/smc_mp12_early_stepwin.json "$OUT"/exp2_smc_g8tau07.json \
  "$OUT"/profile_B*.json bench_details.json docs/results_r5/mc_refresh_probe.json
echo "QUEUE_R5B DONE"
