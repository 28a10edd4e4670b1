#!/bin/bash
# Round-3n TPU queue: the ODE-solver study on the exp-1 full-budget stack.
# Quality: does midpoint at 25/50 steps match the euler-100 reference
# protocol's guided coherence (2nd-order solver on near-straight rectified
# flows)? Euler-25 is the control (1st order at the same step count).
# Throughput: scripts/solver_bench.py on the flagship bench models.
# -> docs/results_r3/solver_study.json (+ solver_bench.json)
set -u
cd "$(dirname "$0")/.."
REPO=$(pwd)
export PYTHONPATH=$REPO:${PYTHONPATH:-}
echo $$ > /tmp/tpu_queue_r3n.pid
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
  local name=$1 solver=$2 steps=$3 save=$4; shift 4
  rm -f "$WD/outputs/evaluation_results.json"
  stage "$name" python -m $CLI.evaluate \
      --transform_type rotate90 \
      --solver "$solver" --num_steps "$steps" \
      --num_samples 512 --dtype bf16 "$@"
  cp "$WD"/outputs/evaluation_results.json "$OUT/$save" \
    && echo "saved $save"
}

evalstage n_eu100 euler 100 solver_eval_euler100.json \
    --guidance_methods none mc_feng --guidance_strengths 0 1
evalstage n_eu25 euler 25 solver_eval_euler25.json \
    --guidance_methods none mc_feng --guidance_strengths 0 1
evalstage n_mid50 midpoint 50 solver_eval_midpoint50.json \
    --guidance_methods none mc_feng --guidance_strengths 0 1
evalstage n_mid25 midpoint 25 solver_eval_midpoint25.json \
    --guidance_methods none mc_feng --guidance_strengths 0 1
evalstage n_heun25 heun 25 solver_eval_heun25.json \
    --guidance_methods none --guidance_strengths 0

stage n_bench python "$REPO/scripts/solver_bench.py"

python - <<'EOF'
import json, os
out_dir = "docs/results_r3"
study = {"workload": "exp-1 full-budget stack (50-epoch flows, 30-epoch "
         "disc ratio), rotate90, 512 samples, N_mc=256, bf16",
         "quality": {}, "throughput": None}
for tag in ("euler100", "euler25", "midpoint50", "midpoint25", "heun25"):
    p = os.path.join(out_dir, f"solver_eval_{tag}.json")
    if not os.path.exists(p):
        continue
    rows = json.load(open(p))
    study["quality"][tag] = {
        f"{r['method']}_gamma{r['guidance_strength']}": r["coherence_acc"]
        for r in rows}
bp = os.path.join(out_dir, "solver_bench.json")
if os.path.exists(bp):
    study["throughput"] = json.load(open(bp))["configs"]
with open(os.path.join(out_dir, "solver_study.json"), "w") as f:
    json.dump(study, f, indent=2)
print("solver_study.json written:",
      json.dumps(study["quality"], indent=1))
EOF
echo "QUEUE_R3N DONE"
