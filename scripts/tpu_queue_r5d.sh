#!/bin/bash
# Round-5 queue D:
#   D1. generalize the ratio-EMA finding cross-modal: retrain the exp-2
#       BatchNorm discriminator with --ema_decay, evaluate mc_feng
#       gamma 1/2 with --ratio_ema (exp-1 result: ratio_ema + one-notch-
#       up gamma dominates raw at matched coherence, ROUND5.md §1).
#       Controls (exp2 raw disc): mc_feng g=1 0.875 / g=2 0.893.
#   D2. end-to-end fused-training demo on real MNIST: 3 epochs of
#       train_flow --modality x at K=1 vs K=16, steps/s from the
#       epoch logs (the bench K-sweep is a microbench; this is the CLI).
set -u
cd "$(dirname "$0")/.."
REPO=$(pwd)
export PYTHONPATH=$REPO:${PYTHONPATH:-}
source "$REPO/scripts/tpu_stage_lib.sh"
echo $$ > /tmp/tpu_queue_r5d.pid

WD2=$REPO/parity_runs/exp2_full
CLI=ratio_guided_multimodal_fm_tpu.cli
OUT=$REPO/docs/results_r5
mkdir -p "$OUT"

wait_queue /tmp/tpu_queue_r5c.pid

# ---------- D1. exp-2 ratio-EMA ----------
if [ ! -d "$WD2/checkpoints/ratio_disc_mnist_svhn_ema_best" ]; then
  stage d1_ratio_ema "$WD2" python -m $CLI.train_ratio_mnist_svhn \
      --loss_type disc --dtype bf16 --ema_decay 0.999
fi
if [ ! -f "$OUT/exp2_ratio_ema_eval.json" ]; then
  rm -f "$WD2/outputs/mnist_svhn/evaluation_results.json"
  stage d1_eval "$WD2" python -m $CLI.evaluate_mnist_svhn \
      --guidance_methods mc_feng --guidance_strengths 1.0 2.0 \
      --ratio_ema --num_samples 512 --dtype bf16 --fid
  cp "$WD2/outputs/mnist_svhn/evaluation_results.json" \
     "$OUT/exp2_ratio_ema_eval.json" \
    && echo "saved $OUT/exp2_ratio_ema_eval.json"
fi

# ---------- D2. fused-training CLI demo ----------
if [ ! -f "$OUT/train_fused_demo.json" ]; then
  DEMO=/tmp/fused_demo_wd
  rm -rf "$DEMO" && mkdir -p "$DEMO"
  ( stage d2_k1 "$DEMO" python -m $CLI.train_flow --modality x \
      --epochs 3 --dtype bf16 --data_root "$REPO/data"
  ) 2>&1 | tee /tmp/fused_demo_k1.log
  rm -rf "$DEMO/checkpoints"
  ( stage d2_k16 "$DEMO" python -m $CLI.train_flow --modality x \
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

track_results "Round-5 queue D: exp2 ratio-EMA eval + fused-training CLI demo" \
  "$OUT/exp2_ratio_ema_eval.json" "$OUT/train_fused_demo.json"
echo "QUEUE_R5D DONE"
