#!/bin/bash
# Round-5 queue E (fresh-VM session): everything that didn't land before
# the VM rotated — /tmp and parity_runs/ were wiped, so this queue first
# runs the checkpoint-free perf stages, then rebuilds both stacks and
# finishes queue D's science.
#
#   E1/E2. profile_sampler at B=256 / B=1024  (VERDICT r4 item 5: explain
#          the B=1024 MFU sag; diff vs r3's B=512 op table)
#   E3.    resblock mega-kernel pay-or-retire bench (VERDICT item 8)
#   E4.    bench.py full run — includes the fused K-step train sweeps
#          (VERDICT item 4: train MFU >=45% or dispatch-floor proof)
#   E5.    exp-1 full-budget stack rebuild (cls, flow_x, flow_y, ratio)
#   E6.    exp-2 full-budget stack rebuild (cls, flow_m, flow_s, ratio)
#   E7.    queue-D science: exp-2 ratio-EMA disc retrain + mc_feng
#          gamma 1/2 eval with --ratio_ema, PLUS the raw-disc control on
#          the same rebuilt stack (r4 controls: 0.875 / 0.893)
#   E8.    queue-D fused-training CLI demo (K=1 vs K=16, 3 epochs)
set -u
cd "$(dirname "$0")/.."
REPO=$(pwd)
export PYTHONPATH=$REPO:${PYTHONPATH:-}
source "$REPO/scripts/tpu_stage_lib.sh"
echo $$ > /tmp/tpu_queue_r5e.pid

WD1=$REPO/parity_runs/exp1_full
WD2=$REPO/parity_runs/exp2_full
CLI=ratio_guided_multimodal_fm_tpu.cli
OUT=$REPO/docs/results_r5
mkdir -p "$OUT" "$WD1" "$WD2"

# ---------- E1/E2. batch-sweep profiles ----------
for B in 256 1024; do
  if [ ! -f "$OUT/profile_B$B.json" ]; then
    stage e_profile$B "$REPO" python scripts/profile_sampler.py \
        --B $B --out "$OUT/profile_B$B.json" --trace_dir /tmp/r5_trace_$B
  fi
done
track_results "Round-5: B=256/1024 sampler profiles (MFU-sag evidence)" \
  "$OUT"/profile_B256.json "$OUT"/profile_B1024.json

# ---------- E3. tier-C mega-kernel verdict ----------
if [ ! -f "$OUT/resblock_kernel_bench.json" ]; then
  stage e3_resblock "$REPO" python scripts/resblock_kernel_bench.py \
      --out "$OUT/resblock_kernel_bench.json"
fi
track_results "Round-5: tier-C fused GN+SiLU+conv kernel TPU bench" \
  "$OUT/resblock_kernel_bench.json"

# ---------- E4. bench with the fused-train sweeps ----------
stage e4_bench "$REPO" python bench.py
track_results "Round-5: bench run (fused K-step train sweep, phase split)" \
  bench_details.json

# ---------- E5. exp-1 stack rebuild ----------
if [ ! -d "$WD1/checkpoints/mnist_classifier" ]; then
  stage e5_cls "$WD1" python -m $CLI.train_classifier
fi
if [ ! -d "$WD1/checkpoints/flow_x_best" ]; then
  stage e5_flow_x "$WD1" python -m $CLI.train_flow --modality x --dtype bf16
fi
if [ ! -d "$WD1/checkpoints/flow_y_rotate90_best" ]; then
  stage e5_flow_y "$WD1" python -m $CLI.train_flow --modality y \
      --transform_type rotate90 --dtype bf16
fi
if [ ! -d "$WD1/checkpoints/ratio_disc_rotate90_best" ]; then
  stage e5_ratio "$WD1" python -m $CLI.train_ratio --loss_type disc \
      --transform_type rotate90 --dtype bf16
fi

# ---------- E6. exp-2 stack rebuild ----------
if [ ! -d "$WD2/checkpoints/mnist32_classifier" ]; then
  stage e6_cls "$WD2" python -m $CLI.train_classifiers_mnist_svhn
fi
if [ ! -d "$WD2/checkpoints/flow_mnist32_best" ]; then
  stage e6_flow_m "$WD2" python -m $CLI.train_flow_mnist32 --dtype bf16
fi
if [ ! -d "$WD2/checkpoints/flow_svhn_best" ]; then
  stage e6_flow_s "$WD2" python -m $CLI.train_flow_svhn --dtype bf16
fi
if [ ! -d "$WD2/checkpoints/ratio_disc_mnist_svhn_best" ]; then
  stage e6_ratio "$WD2" python -m $CLI.train_ratio_mnist_svhn --dtype bf16
fi

# ---------- E7. exp-2 ratio-EMA study (queue D1) ----------
if [ ! -d "$WD2/checkpoints/ratio_disc_mnist_svhn_ema_best" ]; then
  stage e7_ratio_ema "$WD2" python -m $CLI.train_ratio_mnist_svhn \
      --loss_type disc --dtype bf16 --ema_decay 0.999
fi
if [ ! -f "$OUT/exp2_ratio_ema_eval.json" ]; then
  rm -f "$WD2/outputs/mnist_svhn/evaluation_results.json"
  stage e7_eval_ema "$WD2" python -m $CLI.evaluate_mnist_svhn \
      --guidance_methods mc_feng --guidance_strengths 1.0 2.0 \
      --ratio_ema --num_samples 512 --dtype bf16 --fid
  cp "$WD2/outputs/mnist_svhn/evaluation_results.json" \
     "$OUT/exp2_ratio_ema_eval.json" \
    && echo "saved $OUT/exp2_ratio_ema_eval.json"
fi
# raw-disc control on the SAME rebuilt stack (r4 stack is gone; controls
# must come from the artifacts actually being compared)
if [ ! -f "$OUT/exp2_ratio_raw_control.json" ]; then
  rm -f "$WD2/outputs/mnist_svhn/evaluation_results.json"
  stage e7_eval_raw "$WD2" python -m $CLI.evaluate_mnist_svhn \
      --guidance_methods mc_feng --guidance_strengths 1.0 2.0 \
      --num_samples 512 --dtype bf16 --fid
  cp "$WD2/outputs/mnist_svhn/evaluation_results.json" \
     "$OUT/exp2_ratio_raw_control.json" \
    && echo "saved $OUT/exp2_ratio_raw_control.json"
fi
track_results "Round-5: exp-2 ratio-EMA study (EMA vs raw disc, rebuilt stack)" \
  "$OUT/exp2_ratio_ema_eval.json" "$OUT/exp2_ratio_raw_control.json"

# ---------- E8. fused-training CLI demo (queue D2) ----------
if [ ! -f "$OUT/train_fused_demo.json" ]; then
  DEMO=/tmp/fused_demo_wd
  rm -rf "$DEMO" && mkdir -p "$DEMO"
  ( stage e8_k1 "$DEMO" python -m $CLI.train_flow --modality x \
      --epochs 3 --dtype bf16 --data_root "$REPO/data"
  ) 2>&1 | tee /tmp/fused_demo_k1.log
  rm -rf "$DEMO/checkpoints"
  ( stage e8_k16 "$DEMO" python -m $CLI.train_flow --modality x \
      --epochs 3 --dtype bf16 --fused_steps 16 --data_root "$REPO/data"
  ) 2>&1 | tee /tmp/fused_demo_k16.log
  python - <<'EOF'
import json, re
def rates(path):
    try:
        txt = open(path).read()
    except OSError:
        return []
    return [float(m) for m in re.findall(r"\(([0-9.]+) steps/s\)", txt)]
k1 = rates("/tmp/fused_demo_k1.log")
k16 = rates("/tmp/fused_demo_k16.log")
out = {"protocol": ("train_flow --modality x, 3 epochs, B=128, bf16, "
                    "same data root; steps/s from the epoch logs"),
       "k1_epoch_steps_per_sec": k1,
       "k16_epoch_programs_per_sec": k16,
       "k16_epoch_steps_per_sec": [round(16 * v, 1) for v in k16],
       "note": "K=16 logs count PROGRAMS (16 optimizer steps each)"}
json.dump(out, open("/root/repo/docs/results_r5/train_fused_demo.json",
                    "w"), indent=1)
print("demo:", out)
EOF
fi
track_results "Round-5: fused-training CLI demo (K=1 vs K=16 epoch rates)" \
  "$OUT/train_fused_demo.json"
echo "QUEUE_R5E DONE"
