#!/bin/bash
# Round-3q TPU queue: non-uniform time grids on the exp-1 full-budget
# stack. Hypothesis from the reflow study: few-step guided quality is
# bound by where the steps sit (guidance injections + late-t stiffness),
# so a dense-late grid should lift coherence at a fixed velocity-eval
# budget. Uniform controls already measured: euler-25 0.723, euler-8
# (teacher) 0.717, midpoint-12 0.828, midpoint-25 0.832, euler-100
# protocol 0.824.
# -> docs/results_r3/timegrid_eval_*.json, merged timegrid_study.json
set -u
cd "$(dirname "$0")/.."
REPO=$(pwd)
export PYTHONPATH=$REPO:${PYTHONPATH:-}
echo $$ > /tmp/tpu_queue_r3q.pid
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
      --guidance_methods none mc_feng --guidance_strengths 0 1 \
      --num_samples 512 --dtype bf16 "$@"
  cp "$WD"/outputs/evaluation_results.json "$OUT/$save" \
    && echo "saved $save"
}

# uniform control at the 12-NFE point (midpoint-6; no uniform number yet)
evalstage q_mid6_uni timegrid_eval_midpoint6_uniform.json \
    --solver midpoint --num_steps 6
# late grids at matched budgets
evalstage q_mid6_late timegrid_eval_midpoint6_late.json \
    --solver midpoint --num_steps 6 --time_grid late
evalstage q_mid12_late timegrid_eval_midpoint12_late.json \
    --solver midpoint --num_steps 12 --time_grid late
evalstage q_eu8_late timegrid_eval_euler8_late.json \
    --solver euler --num_steps 8 --time_grid late
evalstage q_eu25_late timegrid_eval_euler25_late.json \
    --solver euler --num_steps 25 --time_grid late

python - <<'EOF'
import json, os
out = "docs/results_r3"

def q(path):
    rows = json.load(open(os.path.join(out, path)))
    return {f"{r['method']}_gamma{r['guidance_strength']}":
            r["coherence_acc"] for r in rows}

study = {
    "workload": "exp-1 full-budget stack, rotate90, 512 samples, "
                "N_mc=256, bf16, default 4-chunk fresh-MC eval; "
                "late grid = g(s)=1-(1-s)^2",
    "quality": {}}
pairs = [
    ("midpoint6_uniform", "timegrid_eval_midpoint6_uniform.json"),
    ("midpoint6_late", "timegrid_eval_midpoint6_late.json"),
    ("midpoint12_late", "timegrid_eval_midpoint12_late.json"),
    ("euler8_late", "timegrid_eval_euler8_late.json"),
    ("euler25_late", "timegrid_eval_euler25_late.json"),
    # uniform controls measured earlier
    ("midpoint12_uniform", "solver_eval_midpoint12.json"),
    ("euler25_uniform", "solver_eval_euler25.json"),
    ("euler8_uniform", "reflow_eval_teacher_euler8.json"),
    ("euler100_uniform_reference_protocol", "solver_eval_euler100.json"),
]
for tag, path in pairs:
    if os.path.exists(os.path.join(out, path)):
        study["quality"][tag] = q(path)
with open(os.path.join(out, "timegrid_study.json"), "w") as f:
    json.dump(study, f, indent=2)
print("timegrid_study.json:", json.dumps(study["quality"], indent=1))
EOF
echo "QUEUE_R3Q DONE"
