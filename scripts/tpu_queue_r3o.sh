#!/bin/bash
# Round-3o TPU queue: REFLOW the exp-1 full-budget flows and validate
# few-step guided sampling.
#   1. Distill flow_x and flow_y_rotate90 (cli/reflow.py, 20480 teacher
#      couplings, 10 epochs, warm-started students).
#   2. Evaluate the distilled stack at 8 euler steps and 4 midpoint steps
#      vs the teacher's 100-euler reference protocol (same ratio net,
#      same 512-sample default-chunk eval).
# -> docs/results_r3/reflow_eval_*.json, combined reflow_study.json
set -u
cd "$(dirname "$0")/.."
REPO=$(pwd)
export PYTHONPATH=$REPO:${PYTHONPATH:-}
echo $$ > /tmp/tpu_queue_r3o.pid
WD=$REPO/parity_runs/exp1_full
STAGE=$REPO/scripts/tpu_run_stage.sh
CLI=ratio_guided_multimodal_fm_tpu.cli
OUT=$REPO/docs/results_r3

preflight() {
  for i in $(seq 1 30); do
    if timeout 60 python -c "import jax,jax.numpy as jnp; (jnp.ones((8,8))@jnp.ones((8,8))).block_until_ready()" >/dev/null 2>&1; then
      echo "preflight ok ($1)"; return 0
    fi
    echo "preflight retry $i ($1)"; sleep 30
  done
  echo "preflight FAILED ($1)"; return 1
}

stage() {
  local name=$1; shift
  preflight "$name" || exit 1
  bash "$STAGE" "$name" "$WD" "$@" || { echo "stage $name FAILED"; exit 1; }
  sleep 150
}

stage o_reflow_x python -m $CLI.reflow --modality x \
    --pairs 20480 --gen_batch_size 512 --teacher_steps 100 \
    --epochs 10 --batch_size 128 --dtype bf16
stage o_reflow_y python -m $CLI.reflow --modality y \
    --transform_type rotate90 \
    --pairs 20480 --gen_batch_size 512 --teacher_steps 100 \
    --epochs 10 --batch_size 128 --dtype bf16

evalstage() {
  local name=$1 save=$2; shift 2
  rm -f "$WD/outputs/evaluation_results.json"
  stage "$name" python -m $CLI.evaluate \
      --transform_type rotate90 \
      --guidance_methods none mc_feng --guidance_strengths 0 1 \
      --num_samples 512 --dtype bf16 "$@"
  cp "$WD"/outputs/evaluation_results.json "$OUT/$save" \
    && echo "saved $save"
}

# one more solver-study quality point: midpoint-12 benched at 875/s
# (3.9x euler-100) — does quality hold without distillation?
rm -f "$WD/outputs/evaluation_results.json"
stage o_mid12 python -m $CLI.evaluate \
    --transform_type rotate90 \
    --guidance_methods none mc_feng --guidance_strengths 0 1 \
    --num_samples 512 --dtype bf16 --solver midpoint --num_steps 12
cp "$WD"/outputs/evaluation_results.json "$OUT/solver_eval_midpoint12.json" \
  && echo "saved solver_eval_midpoint12.json"

evalstage o_rf_eu8 reflow_eval_euler8.json \
    --reflow --solver euler --num_steps 8
evalstage o_rf_mid4 reflow_eval_midpoint4.json \
    --reflow --solver midpoint --num_steps 4
evalstage o_rf_eu4 reflow_eval_euler4.json \
    --reflow --solver euler --num_steps 4
# teacher at 8 steps = the control showing distillation (not just the
# solver) is what preserves quality
evalstage o_t_eu8 reflow_eval_teacher_euler8.json \
    --solver euler --num_steps 8

python - <<'EOF'
import json, os
out_dir = "docs/results_r3"
# fold the midpoint-12 point into the solver study
sp = os.path.join(out_dir, "solver_study.json")
mp = os.path.join(out_dir, "solver_eval_midpoint12.json")
if os.path.exists(sp) and os.path.exists(mp):
    study0 = json.load(open(sp))
    rows = json.load(open(mp))
    study0["quality"]["midpoint12"] = {
        f"{r['method']}_gamma{r['guidance_strength']}": r["coherence_acc"]
        for r in rows}
    json.dump(study0, open(sp, "w"), indent=2)

study = {"workload": "exp-1 full-budget stack, rotate90, 512 samples, "
         "N_mc=256, bf16; students = 1-round reflow (20480 couplings, "
         "10 epochs, warm start)", "quality": {}}
for tag in ("euler8", "midpoint4", "euler4", "teacher_euler8"):
    p = os.path.join(out_dir, f"reflow_eval_{tag}.json")
    if not os.path.exists(p):
        continue
    rows = json.load(open(p))
    study["quality"][tag] = {
        f"{r['method']}_gamma{r['guidance_strength']}": r["coherence_acc"]
        for r in rows}
ref = os.path.join(out_dir, "solver_eval_euler100.json")
if os.path.exists(ref):
    rows = json.load(open(ref))
    study["quality"]["teacher_euler100_reference_protocol"] = {
        f"{r['method']}_gamma{r['guidance_strength']}": r["coherence_acc"]
        for r in rows}
with open(os.path.join(out_dir, "reflow_study.json"), "w") as f:
    json.dump(study, f, indent=2)
print("reflow_study.json:", json.dumps(study["quality"], indent=1))
EOF
echo "QUEUE_R3O DONE"
