"""bench.py pure helpers (no TPU): the fast-operating-point merge."""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench


def test_fast_operating_point_merges_solver_bench():
    fp = bench.fast_operating_point()
    if not os.path.exists(os.path.join(os.path.dirname(bench.__file__),
                                       "docs", "results_r3",
                                       "solver_bench.json")):
        assert fp == {}
        return
    # midpoint-12 (0.828 at 3.86x, solver_study.json) preferred when its
    # bench row exists; midpoint-25 is the fallback
    assert fp["config"] in ("--solver midpoint --num_steps 12",
                            "--solver midpoint --num_steps 25")
    assert fp["samples_per_sec"] > 0
    assert fp["velocity_evals_per_step"] == 2
    json.dumps(fp)  # serializable into bench_details
