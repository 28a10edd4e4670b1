"""Throughput: SMC guided sampling vs mc_feng vs unguided on the real chip.

SMC has NO phase A (no MC candidate generation) and its per-step extra
work is one ratio-net eval + O(B·D) gathers — so guided sampling should
cost ~the unguided sampler. This script measures all three at the headline
protocol (100 euler steps, B=512, exp-1 shapes) with the honest
host-readback barrier (bench.py:_sync).

Run from a trained exp-1 run dir (e.g. parity_runs/exp1_full):
    PYTHONPATH=$REPO python $REPO/scripts/smc_bench.py
Writes $REPO/docs/results_r4/smc_bench.json.
"""
from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp

B = int(os.environ.get("SMC_BENCH_B", "512"))
STEPS = int(os.environ.get("SMC_BENCH_STEPS", "100"))
REPS = int(os.environ.get("SMC_BENCH_REPS", "5"))


def _sync(out):
    return float(jnp.sum(out[0][:1]))


def main():
    from ratio_guided_multimodal_fm_tpu.cli.common import (
        fm_model, load_params_or_exit, ratio_log_fn, velocity_fn)
    from ratio_guided_multimodal_fm_tpu.models import RatioEstimatorMNIST
    from ratio_guided_multimodal_fm_tpu.sample import (
        GuidedSamplerConfig, SMCSamplerConfig, generate_mc_set,
        make_guided_sampler, make_smc_sampler)
    from ratio_guided_multimodal_fm_tpu.train.checkpoint import (
        get_checkpoint_path)

    model = fm_model("unet", dtype=jnp.bfloat16)
    init = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 28, 28, 1)),
                      jnp.zeros((1,)))
    px = load_params_or_exit(get_checkpoint_path("flow", "x", None, "best"),
                             init["params"], "FM_x", "train first")
    py = load_params_or_exit(
        get_checkpoint_path("flow", "y", "rotate90", "best"),
        init["params"], "FM_y", "train first")
    ratio = RatioEstimatorMNIST(loss_type="disc")
    r_init = ratio.init(jax.random.PRNGKey(0), jnp.zeros((1, 28, 28, 1)),
                        jnp.zeros((1, 28, 28, 1)))
    pr = load_params_or_exit(
        get_checkpoint_path("ratio", "disc", "rotate90", "best"),
        r_init["params"], "ratio", "train first")
    fm_x = velocity_fn(model, px)
    fm_y = velocity_fn(model, py)
    log_r = ratio_log_fn(ratio, {"params": pr})
    shp = dict(x_shape=(28, 28, 1), y_shape=(28, 28, 1))

    def timed(fn, *args):
        for w in range(2):
            _sync(fn(jax.random.fold_in(jax.random.PRNGKey(w), 7), *args))
        t0 = time.perf_counter()
        for r in range(REPS):
            _sync(fn(jax.random.PRNGKey(100 + r), *args))
        return (time.perf_counter() - t0) / REPS

    out = {"batch": B, "num_steps": STEPS, "reps": REPS}

    cfg_n = GuidedSamplerConfig("none", 0.0, num_steps=STEPS, **shp)
    s_none = jax.jit(make_guided_sampler(fm_x, fm_y, cfg_n),
                     static_argnums=(1,))
    dt = timed(lambda k: s_none(k, B))
    out["none"] = {"sec": round(dt, 3), "samples_per_sec": round(B / dt, 1)}
    print("none:", out["none"], flush=True)

    cfg_s = SMCSamplerConfig(1.0, num_steps=STEPS, resample_group=16, **shp)
    s_smc = jax.jit(make_smc_sampler(fm_x, fm_y, cfg_s, log_r),
                    static_argnums=(1,))
    dt = timed(lambda k: s_smc(k, B))
    out["smc"] = {"sec": round(dt, 3), "samples_per_sec": round(B / dt, 1)}
    print("smc:", out["smc"], flush=True)

    # mc_feng INCLUDING its per-call fresh MC set (the reference protocol
    # and our chunked default regenerate it; generate_mc_set jits/caches).
    cfg_m = GuidedSamplerConfig("mc_feng", 1.0, num_steps=STEPS,
                                mc_batch_size=256, **shp)
    s_mc = jax.jit(make_guided_sampler(fm_x, fm_y, cfg_m, log_r),
                   static_argnums=(1,))

    def mc_full(k):
        mc = generate_mc_set(fm_x, fm_y, log_r, k, 256, (28, 28, 1),
                             (28, 28, 1), STEPS)
        return s_mc(jax.random.fold_in(k, 1), B, mc)

    dt = timed(mc_full)
    out["mc_feng_fresh_set"] = {"sec": round(dt, 3),
                                "samples_per_sec": round(B / dt, 1)}
    print("mc_feng (incl. fresh MC set):", out["mc_feng_fresh_set"],
          flush=True)

    # mc_feng with a warm (pre-generated) set — the serving steady state.
    mc = generate_mc_set(fm_x, fm_y, log_r, jax.random.PRNGKey(3), 256,
                         (28, 28, 1), (28, 28, 1), STEPS)
    import numpy as np
    mc = tuple(jnp.asarray(np.asarray(a)) for a in mc)
    dt = timed(lambda k: s_mc(k, B, mc))
    out["mc_feng_warm_set"] = {"sec": round(dt, 3),
                               "samples_per_sec": round(B / dt, 1)}
    print("mc_feng (warm set):", out["mc_feng_warm_set"], flush=True)

    out["note"] = ("SMC guided sampling at the headline protocol; compare "
                   "'smc' to 'none' (per-step overhead = 1 ratio eval + "
                   "resampling gathers) and to 'mc_feng_fresh_set' (the "
                   "like-for-like guided comparison: both regenerate "
                   "their coupling machinery per call).")
    dst = os.path.join(REPO, "docs/results_r4/smc_bench.json")
    os.makedirs(os.path.dirname(dst), exist_ok=True)
    with open(dst, "w") as f:
        json.dump(out, f, indent=2)
        f.write("\n")
    print("wrote", dst)


if __name__ == "__main__":
    main()
