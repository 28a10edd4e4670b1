"""Throughput half of the solver study: guided B=512 samples/sec for
(solver, num_steps) on the flagship MNIST-SVHN bench models.

Quality half = the evaluate-CLI runs on the exp-1 full-budget stack
(scripts/tpu_queue_r3n.sh). Together -> docs/results_r3/solver_study.json.

Random weights (throughput is weight-independent); protocol identical to
bench.py (_sync host readback, 2 warmups, min of 3 reps).

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/solver_bench.py
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE_B, _build_sampler, _time_config  # noqa: E402

CONFIGS = [
    ("euler", 100),     # reference protocol
    ("euler", 50),
    ("euler", 25),
    ("midpoint", 50),   # 2 evals/step: same evals as euler-100
    ("midpoint", 25),   # half the evals of euler-100
    ("midpoint", 12),
]


def main():
    out = {"batch": HEADLINE_B, "workload": "guided mc_feng, N_mc=256, "
           "bf16 activations, MNIST-SVHN flagship models"}
    rows = {}
    base_t = None
    for solver, steps in CONFIGS:
        sampler, params = _build_sampler(num_steps=steps, solver=solver)
        t = _time_config(sampler, params, HEADLINE_B)
        key = f"{solver}-{steps}"
        rows[key] = {
            "sec_per_batch": round(t, 4),
            "samples_per_sec": round(HEADLINE_B / t, 1),
            "velocity_evals_per_step": 1 if solver == "euler" else 2,
        }
        if solver == "euler" and steps == 100:
            base_t = t
        if base_t is not None:
            rows[key]["speedup_vs_euler100"] = round(base_t / t, 2)
        print(key, rows[key], flush=True)
    out["configs"] = rows
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "docs", "results_r3",
        "solver_bench.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print("saved", path)


if __name__ == "__main__":
    main()
