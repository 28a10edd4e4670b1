"""Assemble docs/results_r2/parity_curve.json — the golden quality-parity
artifact. Combines every measured protocol point from the round-2 campaign:

* P10: matched 10-epoch-ratio budget. The torch reference's discriminator
  is at CHANCE here (plateau + its own patience-5 early stop; ROUND2.md),
  so its guidance is a no-op; the JAX discriminator trains fine.
* BEST-WORKING: each stack's best-performing ratio net — torch needs
  seed 44 + 30 epochs (1 of 4 probed torch runs escapes the plateau inside
  the early-stop window; JAX escapes at epoch 4 of its canonical seed).
  This is the apples-to-apples capability comparison, one shared JAX
  classifier scoring all sample sets.
* SATURATED-30EP: both ratio nets overtrained to acc>0.99. The JAX stack
  degrades at gamma=1 (importance argmax follows the overfit ranking,
  whose top-rank precision on off-distribution flow samples drops
  0.625->0.375 top-8); mitigation legs (--ratio_clip 4, --ess_floor 16)
  measured. The torch eval at this saturation stays positive - open
  asymmetry documented for round 3.

Run from repo root (CPU fine) after the campaign scripts.
"""
import json
import math
import os

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.abspath(os.path.join(HERE, "..", ".."))


def wilson(p, n, z=1.96):
    den = 1 + z * z / n
    c = (p + z * z / (2 * n)) / den
    h = z * math.sqrt(p * (1 - p) / n + z * z / (4 * n * n)) / den
    return [round(c - h, 4), round(c + h, 4)]


def main():
    r2 = os.path.join(REPO, "docs", "results_r2")
    p10 = json.load(open(os.path.join(r2, "parity_p10_ratio10ep.json")))
    torch44_cross = json.load(open("/tmp/torch44_cross.json"))
    jax30 = {
        leg: json.load(open(os.path.join(
            REPO, "parity_runs", "jax", "outputs", f"eval_ratio30_{leg}.json")))
        for leg in ("baseline", "clip4", "essfloor16")
    }

    def col(rows, method, gamma):
        for r in rows:
            if r["method"] == method and r["guidance_strength"] == gamma:
                return r["coherence_acc"]
        return None

    best = []
    for gamma, tag in ((0.0, "none_gamma0.0"), (0.5, "mc_feng_gamma0.5"),
                       (1.0, "mc_feng_gamma1.0")):
        t = torch44_cross[tag]
        # JAX best = the 10-epoch-ratio eval, cross-scored (same file as P10)
        jrow = next(r for r in p10["points"]
                    if r["guidance_strength"] == gamma
                    and (gamma == 0.0) == (r["method"] == "none"))
        j = jrow["jax_samples_jax_classifier"]
        best.append({
            "guidance_strength": gamma,
            "torch_best_effort": t, "torch_ci95": wilson(t, 512),
            "jax_best": j, "jax_ci95": wilson(j, 512),
            "abs_gap": round(abs(t - j), 4),
            "ci_overlap": max(wilson(t, 512)[0], wilson(j, 512)[0])
                          <= min(wilson(t, 512)[1], wilson(j, 512)[1]),
        })

    sat = []
    for gamma in (0.0, 0.5, 1.0):
        m = "none" if gamma == 0.0 else "mc_feng"
        sat.append({
            "guidance_strength": gamma,
            "jax_saturated_baseline": col(jax30["baseline"], m, gamma),
            "jax_saturated_ratio_clip4": col(jax30["clip4"], m, gamma),
            "jax_saturated_ess_floor16": col(jax30["essfloor16"], m, gamma),
        })

    out = {
        "experiment": "MNIST <-> rotate90 (exp-1), frozen synthetic IDX "
                      "dataset, identical data + hyperparameters both stacks",
        "eval": {"num_samples": 512, "num_steps": 100, "mc_batch_size": 256},
        "scoring": "all *_cross / best rows scored with ONE trained JAX "
                   "classifier (apples-to-apples)",
        "headline_best_working_point": {
            "description": "each stack's best-working ratio net (torch: "
                           "seed 44, 30 ep — the only 1 of 4 probed torch "
                           "runs whose discriminator escapes its chance "
                           "plateau before the reference's own patience-5 "
                           "early stop; JAX: canonical seed, 10 ep, escapes "
                           "at epoch 4)",
            "points": best,
        },
        "p10_matched_budget": {
            "description": "identical 10-epoch ratio budget both sides; "
                           "torch discriminator at chance (plateau)",
            "points": p10["points"],
        },
        "saturated_30ep_regime": {
            "description": "ratio overtrained to acc>0.99 both stacks; JAX "
                           "guidance degrades at gamma=1 (overfit ranking: "
                           "top-8 MC-pair coherence drops 0.625->0.375 on "
                           "flow samples); mitigations measured; torch eval "
                           "at same saturation stays positive (open "
                           "asymmetry, round-3 item)",
            "points": sat,
            "torch_seed44_saturated_own_protocol": {
                "0.0": 0.0879, "0.5": 0.3145, "1.0": 0.3145},
        },
        "training_robustness": {
            "jax_plateau_escape_epoch_seed42": 4,
            "torch_plateau_escape_epochs": {"42": "~31 (early stop would "
                                            "kill at ~12)", "43": ">30",
                                            "44": "~10", "45": ">5 (probe "
                                            "cut short)"},
        },
    }
    path = os.path.join(r2, "parity_curve.json")
    json.dump(out, open(path, "w"), indent=2)
    print("wrote", path)
    for b in best:
        print(b)


if __name__ == "__main__":
    main()
