#!/bin/bash
# Round-3p TPU queue: the two controls the r3o reflow study still needs.
#   1. teacher + midpoint-4 — at the 8-NFE point, r3o measured
#      reflow-euler8 (0.721) == teacher-euler8 (0.717) and
#      reflow-midpoint4 = 0.787; this control separates "2nd-order
#      solver" from "distillation" at equal velocity-eval budget.
#   2. classifier-FID at euler-4 (teacher vs reflow student) plus the
#      euler-100 FID reference — reflow theory says straightening pays
#      in few-step SAMPLE FIDELITY, which coherence (near-chance
#      unguided) can't see.
# -> docs/results_r3/reflow_eval_{teacher_midpoint4,euler4_fid,
#    teacher_euler4_fid,teacher_euler100_fid}.json, reflow_study.json
set -u
cd "$(dirname "$0")/.."
REPO=$(pwd)
export PYTHONPATH=$REPO:${PYTHONPATH:-}
echo $$ > /tmp/tpu_queue_r3p.pid
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

evalstage() {
  local name=$1 save=$2; shift 2
  rm -f "$WD/outputs/evaluation_results.json"
  stage "$name" python -m $CLI.evaluate \
      --transform_type rotate90 \
      --num_samples 512 --dtype bf16 "$@"
  cp "$WD"/outputs/evaluation_results.json "$OUT/$save" \
    && echo "saved $save"
}

# control 1: teacher at midpoint-4 (8 velocity evals, like euler-8)
evalstage p_t_mid4 reflow_eval_teacher_midpoint4.json \
    --guidance_methods none mc_feng --guidance_strengths 0 1 \
    --solver midpoint --num_steps 4

# control 2: unguided sample fidelity (classifier-FID) at euler-4,
# teacher vs student, with the 100-step teacher as the FID floor
evalstage p_rf_eu4_fid reflow_eval_euler4_fid.json \
    --guidance_methods none --guidance_strengths 0 \
    --reflow --solver euler --num_steps 4 --fid
evalstage p_t_eu4_fid reflow_eval_teacher_euler4_fid.json \
    --guidance_methods none --guidance_strengths 0 \
    --solver euler --num_steps 4 --fid
evalstage p_t_eu100_fid reflow_eval_teacher_euler100_fid.json \
    --guidance_methods none --guidance_strengths 0 \
    --solver euler --num_steps 100 --fid

python - <<'EOF'
import json, os
out_dir = "docs/results_r3"
study_path = os.path.join(out_dir, "reflow_study.json")
study = json.load(open(study_path)) if os.path.exists(study_path) else {
    "quality": {}}
for tag in ("teacher_midpoint4",):
    p = os.path.join(out_dir, f"reflow_eval_{tag}.json")
    if os.path.exists(p):
        rows = json.load(open(p))
        study["quality"][tag] = {
            f"{r['method']}_gamma{r['guidance_strength']}":
                r["coherence_acc"] for r in rows}
fid = {}
for tag in ("euler4_fid", "teacher_euler4_fid", "teacher_euler100_fid"):
    p = os.path.join(out_dir, f"reflow_eval_{tag}.json")
    if os.path.exists(p):
        rows = json.load(open(p))
        fid[tag] = {k: rows[0][k] for k in
                    ("classifier_fid_x", "coherence_acc") if k in rows[0]}
if fid:
    study["unguided_fid"] = fid
    study["unguided_fid_note"] = (
        "classifier-feature Frechet distance (eval/fid.py), x modality, "
        "unguided euler sampling; 512 samples vs the MNIST test set")
with open(study_path, "w") as f:
    json.dump(study, f, indent=2)
print("reflow_study.json:", json.dumps(
    {"quality": study["quality"], "unguided_fid": study.get("unguided_fid")},
    indent=1))
EOF
echo "QUEUE_R3P DONE"
