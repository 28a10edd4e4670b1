"""Measure the merged-pair U-Net evaluator (models/merged.py) on real TPU.

Workload: experiment-1 twin sampler (two FlowMatchingUNets, 28px, 901K
params each — ref unet.py:282-305), B=512, N_mc=256, 100 Euler steps,
mc_feng — the same protocol as bench.py's headline but on the
same-topology pair where merging applies. Times the FULL pipeline
(phase A + main ODE), merged vs separate.

Writes docs/results_r3/merged_experiment.json.

Run via a preflight-gated shell (CLAUDE.md TPU rules):
  PYTHONPATH=/root/repo:$PYTHONPATH python scripts/merged_experiment.py
"""
from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp

from ratio_guided_multimodal_fm_tpu.models import RatioEstimatorMNIST
from ratio_guided_multimodal_fm_tpu.models.merged import (
    can_merge,
    merged_pair_apply,
)
from ratio_guided_multimodal_fm_tpu.models.unet import FlowMatchingUNet
from ratio_guided_multimodal_fm_tpu.sample.guided import (
    GuidedSamplerConfig,
    make_guided_sampler_p,
)

B = 512
MC = 256
STEPS = 100
REPS = 3


def _sync(out):
    # Host readback barrier — block_until_ready lies on axon (CLAUDE.md).
    return float(jnp.sum(out[0][:1]))


def build(merged: bool):
    dtype = jnp.bfloat16
    fm = FlowMatchingUNet(dtype=dtype)
    ratio = RatioEstimatorMNIST()
    k = jax.random.PRNGKey(0)
    z = jnp.zeros((1, 28, 28, 1))
    px = fm.init(k, z, jnp.zeros((1,)))["params"]
    py = fm.init(jax.random.PRNGKey(1), z, jnp.zeros((1,)))["params"]
    rv = ratio.init(k, z, z)
    assert can_merge(fm, fm)

    cfg = GuidedSamplerConfig(
        guidance_method="mc_feng", guidance_strength=0.5,
        num_steps=STEPS, mc_batch_size=MC,
        x_shape=(28, 28, 1), y_shape=(28, 28, 1), scan_unroll=4)
    sampler = jax.jit(
        make_guided_sampler_p(
            lambda p, x, t: fm.apply({"params": p}, x, t),
            lambda p, y, t: fm.apply({"params": p}, y, t),
            cfg,
            lambda v, x, y: ratio.apply(v, x, y, method=ratio.log_ratio),
            fm_pair_apply=merged_pair_apply(fm) if merged else None),
        static_argnums=(2,))
    return sampler, (px, py, rv)


def time_full(sampler, params):
    for w in range(2):
        _sync(sampler(params, jax.random.PRNGKey(1 + w), B))
    ts = []
    for i in range(REPS):
        t0 = time.perf_counter()
        _sync(sampler(params, jax.random.PRNGKey(3 + i), B))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    out = {"workload": {"B": B, "N_mc": MC, "num_steps": STEPS,
                        "pair": "2x FlowMatchingUNet 28px (901K each)",
                        "dtype": "bf16 activations"},
           "hardware": f"{jax.devices()[0].device_kind}"}
    for name, merged in (("separate", False), ("merged", True)):
        s, p = build(merged)
        t = time_full(s, p)
        out[name] = {"full_pipeline_sec": round(t, 4),
                     "samples_per_sec": round(B / t, 1)}
        print(name, out[name], flush=True)
    out["speedup_full"] = round(
        out["separate"]["full_pipeline_sec"]
        / out["merged"]["full_pipeline_sec"], 3)
    os.makedirs("docs/results_r3", exist_ok=True)
    with open("docs/results_r3/merged_experiment.json", "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
