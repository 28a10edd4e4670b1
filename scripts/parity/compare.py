"""Merge the torch-reference and JAX curves into the golden parity artifact.

Inputs (produced by run_torch_reference.py / run_jax_side.py):
  parity_runs/torch/outputs/golden_curve.json   + samples_*.npz (NCHW)
  parity_runs/jax/outputs/evaluation_results.json + samples_*.npz (NHWC)

Each implementation scores its own samples with its own classifier, but the
two classifiers are different networks trained by different frameworks — so
this script ALSO cross-scores every sample set with the single JAX
classifier (the same trained weights for all four cells), which is the
apples-to-apples comparison: same data, same hyperparameters, same metric
model; only the generative stack differs.

Writes docs/results_r2/parity_curve.json with per-point Wilson 95% CIs.
Run from the repo root (CPU is fine): python scripts/parity/compare.py
"""
from __future__ import annotations

import json
import math
import os
import sys

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.abspath(os.path.join(HERE, "..", ".."))
sys.path.insert(0, REPO)

TORCH_OUT = os.path.join(REPO, "parity_runs", "torch", "outputs")
JAX_OUT = os.path.join(REPO, "parity_runs", "jax", "outputs")
TRANSFORM = "rotate90"
CONFIGS = [("none", 0.0), ("mc_feng", 0.5), ("mc_feng", 1.0)]


def wilson_ci(p: float, n: int, z: float = 1.96):
    if n == 0:
        return (0.0, 1.0)
    den = 1 + z * z / n
    center = (p + z * z / (2 * n)) / den
    half = z * math.sqrt(p * (1 - p) / n + z * z / (4 * n * n)) / den
    return (round(center - half, 4), round(center + half, 4))


def load_samples(path: str, layout: str):
    z = np.load(path)
    x, y = z["x"], z["y"]
    if layout == "NCHW":
        x = np.transpose(x, (0, 2, 3, 1))
        y = np.transpose(y, (0, 2, 3, 1))
    return np.ascontiguousarray(x, np.float32), np.ascontiguousarray(y, np.float32)


def main() -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from ratio_guided_multimodal_fm_tpu.eval.coherence import (
        evaluate_coherence,
    )
    from ratio_guided_multimodal_fm_tpu.models import MNISTClassifier
    from ratio_guided_multimodal_fm_tpu.train.checkpoint import load_params

    with open(os.path.join(TORCH_OUT, "golden_curve.json")) as f:
        torch_curve = json.load(f)
    with open(os.path.join(JAX_OUT, "evaluation_results.json")) as f:
        jax_curve = json.load(f)

    clf = MNISTClassifier()
    template = clf.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 28, 28, 1)))["params"]
    clf_params = load_params(
        os.path.join(REPO, "parity_runs", "jax", "checkpoints",
                     "mnist_classifier"), template)
    classify = jax.jit(lambda x: clf.apply({"params": clf_params}, x))

    def cross_score(npz_path, layout):
        x, y = load_samples(npz_path, layout)
        m = evaluate_coherence(jnp.asarray(x), jnp.asarray(y), classify,
                               TRANSFORM)
        return m["coherence_acc"], m["num_samples"]

    points = []
    for method, gamma in CONFIGS:
        row = {"method": method, "guidance_strength": gamma}
        t = next((r for r in torch_curve
                  if r["method"] == method
                  and r["guidance_strength"] == gamma), None)
        j = next((r for r in jax_curve
                  if r["method"] == method
                  and r["guidance_strength"] == gamma), None)
        if t:
            row["torch_own_classifier"] = t["coherence_acc"]
            row["torch_ci95"] = wilson_ci(t["coherence_acc"],
                                          t["num_samples"])
        if j:
            row["jax_own_classifier"] = j["coherence_acc"]
            row["jax_ci95"] = wilson_ci(j["coherence_acc"], j["num_samples"])
            if "ess_final_mean" in j:
                row["jax_ess_final_mean"] = j["ess_final_mean"]

        tag = f"{method}_gamma{gamma}"
        tnpz = os.path.join(TORCH_OUT, f"samples_{tag}.npz")
        jnpz = os.path.join(JAX_OUT, f"samples_{tag}_{TRANSFORM}.npz")
        if os.path.exists(tnpz):
            acc, n = cross_score(tnpz, "NCHW")
            row["torch_samples_jax_classifier"] = acc
            row["torch_cross_ci95"] = wilson_ci(acc, n)
        if os.path.exists(jnpz):
            acc, n = cross_score(jnpz, "NHWC")
            row["jax_samples_jax_classifier"] = acc
            row["jax_cross_ci95"] = wilson_ci(acc, n)
        if ("torch_samples_jax_classifier" in row
                and "jax_samples_jax_classifier" in row):
            row["abs_gap_same_classifier"] = round(
                abs(row["torch_samples_jax_classifier"]
                    - row["jax_samples_jax_classifier"]), 4)
            lo1, hi1 = row["torch_cross_ci95"]
            lo2, hi2 = row["jax_cross_ci95"]
            row["ci_overlap"] = bool(max(lo1, lo2) <= min(hi1, hi2))
        points.append(row)

    out = {
        "experiment": "MNIST <-> rotate90 (exp-1), frozen synthetic IDX "
                      "dataset, identical data + hyperparameters",
        "training": {
            "classifier_epochs": int(os.environ.get("PARITY_EPOCHS_CLS", "3")),
            "flow_epochs": int(os.environ.get("PARITY_EPOCHS_FLOW", "5")),
            "ratio_epochs": int(os.environ.get("PARITY_EPOCHS_RATIO", "10")),
            "batch_size": 128,
            "lr_flows_ratio": 1e-4, "lr_classifier": 1e-3},
        "eval": {"num_samples": int(os.environ.get("PARITY_N", "512")),
                 "num_steps": 100, "mc_batch_size": 256},
        "comparison_note": "'*_jax_classifier' columns score BOTH "
                           "implementations' samples with the same trained "
                           "JAX classifier — the apples-to-apples metric.",
        "points": points,
    }
    dst = os.path.join(REPO, "docs", "results_r2")
    os.makedirs(dst, exist_ok=True)
    path = os.path.join(dst, "parity_curve.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out["points"], indent=2))
    print("wrote", path)


if __name__ == "__main__":
    main()
