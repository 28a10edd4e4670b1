"""Mechanism probe for the measured-harmful --mc_refresh knob (ROUND5 §2).

Round-4 quality study (docs/results_r4/mc_refresh{2,4}_eval.json): refresh
K=2/4 collapses coherence 0.824 -> 0.363/0.213 and FID 218 -> 452/641 at
mc_feng gamma=1. Hypothesis (VERDICT r4): each fresh candidate set re-ranks
the trajectory mid-flight and yanks the argmax-locked trajectory toward a
NEW far candidate, whose conditional velocity (x1 - x_t)/(1 - t) is huge
and incoherent at late t.

This probe runs the fused sampler on the trained exp-1 stack on CPU
(small B — mechanism, not quality) with per-step `w_argmax` + `g_x_norm`
diagnostics (sample/guided.py:mc_feng_guidance) and reports:

  * per-step argmax-switch fraction, split into within-segment steps vs
    the first step after each refresh boundary (K>1),
  * the guidance-magnitude trace g_x_norm(t), and the boundary spike
    ratio g[boundary] / g[last-5-steps-of-previous-segment],
  * trajectory ESS around boundaries.

Run (CPU, from an exp-1 workdir with trained checkpoints):
    cd parity_runs/exp1_full && \
    PYTHONPATH=/root/repo:$PYTHONPATH python /root/repo/scripts/mc_refresh_probe.py \
        --out /root/repo/docs/results_r5/mc_refresh_probe.json
"""
from __future__ import annotations

import argparse
import json
import os

import jax

jax.config.update("jax_platforms", "cpu")  # mechanism probe — CPU only

import jax.numpy as jnp
import numpy as np

from ratio_guided_multimodal_fm_tpu.cli.common import (
    fm_model,
    load_params_or_exit,
    ratio_log_fn,
    velocity_fn,
)
from ratio_guided_multimodal_fm_tpu.core.prng import set_seed
from ratio_guided_multimodal_fm_tpu.models import RatioEstimatorMNIST
from ratio_guided_multimodal_fm_tpu.sample.guided import (
    GuidedSamplerConfig,
    make_guided_sampler,
)
from ratio_guided_multimodal_fm_tpu.train.checkpoint import (
    get_checkpoint_path,
)


def run_probe(fm_x, fm_y, log_ratio, refresh: int, num_steps: int,
              batch: int, mc_batch: int, gamma: float, key) -> dict:
    cfg = GuidedSamplerConfig(
        guidance_method="mc_feng", guidance_strength=gamma,
        num_steps=num_steps, mc_batch_size=mc_batch,
        x_shape=(28, 28, 1), y_shape=(28, 28, 1), mc_refresh=refresh)
    sampler = jax.jit(make_guided_sampler(fm_x, fm_y, cfg, log_ratio),
                      static_argnums=(1,))
    x1, y1, diags = sampler(key, batch)
    amax = np.asarray(diags["w_argmax"])          # [T, B]
    gx = np.asarray(diags["g_x_norm"], np.float64)  # [T]
    ess = np.asarray(diags["ess"], np.float64)    # [T, B]

    T = num_steps
    switched = (amax[1:] != amax[:-1]).mean(axis=1)  # [T-1] frac switched
    seg = T // refresh
    boundary_steps = [k * seg for k in range(1, refresh)]  # step indices t
    b_mask = np.zeros(T - 1, bool)
    for b in boundary_steps:
        b_mask[b - 1] = True  # switch measured between step b-1 and b
    within = switched[~b_mask]
    out = {
        "mc_refresh": refresh,
        "switch_frac_within_segment_mean": float(within.mean()),
        "switch_frac_within_segment_late":
            float(switched[~b_mask][-(T // 4):].mean()),
        "switch_frac_at_boundaries":
            (float(switched[b_mask].mean()) if b_mask.any() else None),
        "g_x_norm_trace": [round(float(v), 4) for v in gx],
        "ess_mean_trace": [round(float(v), 3) for v in ess.mean(axis=1)],
    }
    if boundary_steps:
        spikes = []
        for b in boundary_steps:
            pre = gx[max(0, b - 5):b].mean()
            spikes.append(float(gx[b] / max(pre, 1e-12)))
        out["boundary_g_spike_ratios"] = [round(s, 3) for s in spikes]
        out["boundary_steps_t"] = [round(b / T, 3) for b in boundary_steps]
    return out


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--out", type=str, required=True)
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--mc_batch_size", type=int, default=256)
    p.add_argument("--num_steps", type=int, default=100)
    p.add_argument("--gamma", type=float, default=1.0)
    p.add_argument("--transform_type", type=str, default="rotate90")
    p.add_argument("--seed", type=int, default=42)
    args = p.parse_args(argv)

    key = set_seed(args.seed)
    model = fm_model("unet")
    init = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 28, 28, 1)),
                      jnp.zeros((1,)))
    params_x = load_params_or_exit(
        get_checkpoint_path("flow", "x", None, None, "best"),
        init["params"], "FM_x", "")
    params_y = load_params_or_exit(
        get_checkpoint_path("flow", "y", args.transform_type, None, "best"),
        init["params"], "FM_y", "")
    ratio = RatioEstimatorMNIST(loss_type="disc")
    r_init = ratio.init(jax.random.PRNGKey(0), jnp.zeros((1, 28, 28, 1)),
                        jnp.zeros((1, 28, 28, 1)))
    r_params = load_params_or_exit(
        get_checkpoint_path("ratio", "disc", args.transform_type, "best"),
        r_init["params"], "Ratio estimator", "")

    fm_x = velocity_fn(model, params_x)
    fm_y = velocity_fn(model, params_y)
    log_ratio = ratio_log_fn(ratio, {"params": r_params})

    results = []
    for K in (1, 2, 4):
        print(f"probing mc_refresh={K} ...", flush=True)
        r = run_probe(fm_x, fm_y, log_ratio, K, args.num_steps, args.batch,
                      args.mc_batch_size, args.gamma,
                      jax.random.PRNGKey(args.seed))
        print({k: v for k, v in r.items() if "trace" not in k}, flush=True)
        results.append(r)

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump({"protocol": vars(args), "results": results}, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
