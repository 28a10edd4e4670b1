#!/bin/bash
# Round-5 queue F: re-run the tier-C mega-kernel bench with the
# scan-chained timing protocol. The first run (queue E3) measured the
# ~26 ms axon dispatch floor on every shape — single-op dispatch through
# the tunnel is latency-dominated, so XLA-vs-pallas was unresolvable.
# resblock_kernel_bench.py now chains K=100 applications per program
# (profile_sampler.py's microbench protocol) and records the dispatch
# floor separately.
set -u
cd "$(dirname "$0")/.."
REPO=$(pwd)
export PYTHONPATH=$REPO:${PYTHONPATH:-}
source "$REPO/scripts/tpu_stage_lib.sh"
echo $$ > /tmp/tpu_queue_r5f.pid

OUT=$REPO/docs/results_r5
mkdir -p "$OUT"

wait_queue /tmp/tpu_queue_r5e.pid

stage f1_resblock_chain "$REPO" python scripts/resblock_kernel_bench.py \
    --out "$OUT/resblock_kernel_bench_chain.json"

track_results "Round-5 queue F: tier-C kernel bench, scan-chained timing (dispatch floor amortized)" \
  "$OUT/resblock_kernel_bench_chain.json"
echo "QUEUE_R5F DONE"
