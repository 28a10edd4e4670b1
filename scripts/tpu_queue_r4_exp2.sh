#!/bin/bash
# Round-3g TPU queue: BASELINE configs #3/#4 at the REFERENCE'S OWN
# training budgets (flows 50 epochs, ratio 30, classifiers 10 — the
# budgets in reference README.md:74-110 / SURVEY §6), final round-3 code,
# DEFAULT flags (chunked fresh-MC eval). Prior quality artifacts trained
# flows for <=12 epochs; this is the "train everything like the reference
# would, then evaluate with our defaults" headline run.
#
# Fresh workdir parity_runs/exp2_full (synthetic procedural MNIST/SVHN —
# offline protocol, RGMF_SYNTH_N default). Every stage runs under
# tpu_run_stage.sh (wedge watchdog) after a preflight; 150s sleeps cover
# the lazy chip release between stages (CLAUDE.md).
# -> docs/results_r4/exp2_full_budget_eval_r4.json
set -u
cd "$(dirname "$0")/.."
REPO=$(pwd)
export PYTHONPATH=$REPO:${PYTHONPATH:-}
echo $$ > /tmp/tpu_queue_r4exp2.pid
WD=$REPO/parity_runs/exp2_full
mkdir -p "$WD"
STAGE=$REPO/scripts/tpu_run_stage.sh
CLI=ratio_guided_multimodal_fm_tpu.cli

preflight() {
  for i in $(seq 1 30); do
    if timeout 60 python -c "import jax,jax.numpy as jnp; (jnp.ones((8,8))@jnp.ones((8,8))).block_until_ready()" >/dev/null 2>&1; then
      echo "preflight ok ($1)"; return 0
    fi
    echo "preflight retry $i ($1)"; sleep 30
  done
  echo "preflight FAILED ($1)"; return 1
}

stage() {  # stage <name> <cmd...>
  local name=$1; shift
  preflight "$name" || exit 1
  bash "$STAGE" "$name" "$WD" "$@" || { echo "stage $name FAILED"; exit 1; }
  sleep 150   # lazy chip release before the next client
}

if [ ! -d "$WD/checkpoints/mnist32_classifier" ]; then
  stage g_cls python -m $CLI.train_classifiers_mnist_svhn
fi
if [ ! -d "$WD/checkpoints/flow_mnist32_best" ]; then
  stage g_flow_m python -m $CLI.train_flow_mnist32 --dtype bf16
fi
if [ ! -d "$WD/checkpoints/flow_svhn_best" ]; then
  stage g_flow_s python -m $CLI.train_flow_svhn --dtype bf16
fi
if [ ! -d "$WD/checkpoints/ratio_disc_mnist_svhn_best" ]; then
  stage g_ratio python -m $CLI.train_ratio_mnist_svhn --dtype bf16
fi
mkdir -p "$REPO/docs/results_r4"
rm -f "$WD/outputs/mnist_svhn/evaluation_results.json"
stage g_eval python -m $CLI.evaluate_mnist_svhn \
    --guidance_methods none mc_feng \
    --guidance_strengths 0 0.5 1.0 2.0 5.0 \
    --num_samples 512 --dtype bf16 --fid
cp "$WD"/outputs/mnist_svhn/evaluation_results.json \
   "$REPO"/docs/results_r4/exp2_full_budget_eval_r4.json \
  && echo "saved docs/results_r4/exp2_full_budget_eval_r4.json"
echo "QUEUE_R4EXP2 DONE"

# SMC gamma sweep on the exp-2 stack (cross-modality: asymmetric
# BatchNorm ratio net, 1ch vs 3ch shapes)
rm -f "$WD/outputs/mnist_svhn/evaluation_results.json"
stage g_smc python -m $CLI.evaluate_mnist_svhn \
    --guidance_methods smc \
    --guidance_strengths 0.5 1.0 2.0 5.0 \
    --num_samples 512 --dtype bf16 --fid
cp "$WD"/outputs/mnist_svhn/evaluation_results.json \
   "$REPO"/docs/results_r4/exp2_smc_sweep.json \
  && echo "saved docs/results_r4/exp2_smc_sweep.json"
echo "QUEUE_R4EXP2_SMC DONE"
