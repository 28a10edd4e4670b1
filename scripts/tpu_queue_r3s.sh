#!/bin/bash
# Round-3s TPU queue: compose the two winning levers. r3q/r3r showed
# midpoint kills late-t truncation and 'early' grids feed mc_feng's
# early candidate lock-in. If the effects compose, midpoint x early at
# 6 steps (12 NFE) should approach the euler-100 protocol (0.824), and
# midpoint-4 early (8 NFE) should beat teacher-midpoint4 (0.752).
# Also probe stronger early warp at euler-8 (is p=2 optimal?).
# -> docs/results_r3/timegrid_eval_*.json, merged into timegrid_study.json
set -u
cd "$(dirname "$0")/.."
REPO=$(pwd)
export PYTHONPATH=$REPO:${PYTHONPATH:-}
echo $$ > /tmp/tpu_queue_r3s.pid
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

evalstage s_mid6_early timegrid_eval_midpoint6_early.json \
    --solver midpoint --num_steps 6 --time_grid early
evalstage s_mid4_early timegrid_eval_midpoint4_early.json \
    --solver midpoint --num_steps 4 --time_grid early
evalstage s_eu8_early3 timegrid_eval_euler8_early_p3.json \
    --solver euler --num_steps 8 --time_grid early --grid_power 3.0

python - <<'EOF'
import json, os
out = "docs/results_r3"

def q(path):
    rows = json.load(open(os.path.join(out, os.path.basename(path))))
    return {f"{r['method']}_gamma{r['guidance_strength']}":
            r["coherence_acc"] for r in rows}

sp = os.path.join(out, "timegrid_study.json")
study = json.load(open(sp))
for tag, path in [
    ("midpoint6_early", "timegrid_eval_midpoint6_early.json"),
    ("midpoint4_early", "timegrid_eval_midpoint4_early.json"),
    ("euler8_early_p3", "timegrid_eval_euler8_early_p3.json"),
]:
    p = os.path.join(out, path)
    if os.path.exists(p):
        study["quality"][tag] = q(p)
with open(sp, "w") as f:
    json.dump(study, f, indent=2)
print("timegrid_study.json:", json.dumps(study["quality"], indent=1))
EOF
echo "QUEUE_R3R DONE"
