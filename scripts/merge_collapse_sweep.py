"""Merge the three collapse-regime eval JSONs into the round-2 artifact
docs/results_r2/collapse_sweep.json (see scripts/collapse_sweep.sh).

The claim this artifact proves (VERDICT r1 item 2): in the brittle
30-epoch-flow regime, baseline mc_feng collapses at gamma>=0.5 while
--ess_floor keeps guided coherence at or above the unguided level.
"""
from __future__ import annotations

import json
import os

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
OUT = os.path.join(REPO, "parity_runs", "collapse", "outputs")

POLICIES = [
    ("baseline", "eval_baseline.json", "reference parity, no mitigation"),
    ("ratio_clip4", "eval_ratio_clip4.json", "|log r| clipped to 4"),
    ("ess_floor16", "eval_ess_floor16.json",
     "gamma_eff = gamma*min(1, ESS/16) per trajectory"),
]


def main() -> None:
    rows = []
    for name, fname, desc in POLICIES:
        path = os.path.join(OUT, fname)
        if not os.path.exists(path):
            print(f"missing {path}, skipping")
            continue
        with open(path) as f:
            for r in json.load(f):
                rows.append({"policy": name, "policy_desc": desc, **r})

    base = {r["guidance_strength"]: r["coherence_acc"]
            for r in rows if r["policy"] == "baseline"
            and r["method"] == "mc_feng"}
    mitig = {r["guidance_strength"]: r["coherence_acc"]
             for r in rows if r["policy"] == "ess_floor16"
             and r["method"] == "mc_feng"}
    unguided = next((r["coherence_acc"] for r in rows
                     if r["method"] == "none"), None)

    doc = {
        "regime": "30-epoch flows + 12-epoch disc ratio, frozen synthetic "
                  "IDX digits, rotate90 (the round-1 brittle regime: "
                  "importance weights collapse, ESS->1)",
        "eval": {"num_samples": 512, "num_steps": 100, "mc_batch_size": 256},
        "unguided_coherence": unguided,
        "baseline_mc_feng": base,
        "ess_floor16_mc_feng": mitig,
        "rows": rows,
    }
    dst = os.path.join(REPO, "docs", "results_r2")
    os.makedirs(dst, exist_ok=True)
    with open(os.path.join(dst, "collapse_sweep.json"), "w") as f:
        json.dump(doc, f, indent=2)
    print(json.dumps({"unguided": unguided, "baseline": base,
                      "ess_floor16": mitig}, indent=2))
    print("wrote docs/results_r2/collapse_sweep.json")


if __name__ == "__main__":
    main()
