"""Structural-optimization race on the real sampler workload (round 3).

Measures, on the bench.py headline workload (MNIST-SVHN, B=512, N_mc=256,
100 steps, bf16):
  1. per-net ODE scans with split_skip on/off (decoder concat elimination
     via layers._SplitGNSiLU/_SplitConv — same math, same params)
  2. the FULL fused guided sampler with the better variant
  3. scan_unroll 4 vs 8 on the winner

Run (TPU): PYTHONPATH=/root/repo:$PYTHONPATH python scripts/opt_experiment.py
Output: docs/results_r3/opt_experiment.json
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from ratio_guided_multimodal_fm_tpu.flow.cfm import euler_scan
from ratio_guided_multimodal_fm_tpu.models import (
    RatioEstimatorMNISTSVHN,
)
from ratio_guided_multimodal_fm_tpu.models.unet import FlexibleUNet
from ratio_guided_multimodal_fm_tpu.sample.guided import (
    GuidedSamplerConfig,
    make_guided_sampler_p,
)

B = 512
STEPS = 100


def _sync(x):
    return float(jnp.sum(jnp.asarray(x).ravel()[:1]))


def _time(fn, *args, reps=3):
    for _ in range(2):
        _sync(fn(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        _sync(fn(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def nets(split):
    kw = dict(dtype=jnp.bfloat16, split_skip=split)
    fm_m = FlexibleUNet(in_channels=1, img_size=32, model_channels=32,
                        channel_mult=(1, 2), **kw)
    fm_s = FlexibleUNet(in_channels=3, img_size=32, model_channels=64,
                        channel_mult=(1, 2, 2), **kw)
    k = jax.random.PRNGKey(0)
    pm = fm_m.init(k, jnp.zeros((1, 32, 32, 1)), jnp.zeros((1,)))["params"]
    ps = fm_s.init(k, jnp.zeros((1, 32, 32, 3)), jnp.zeros((1,)))["params"]
    return fm_m, pm, fm_s, ps


def main():
    out = {"B": B, "steps": STEPS}
    x0m = jax.random.normal(jax.random.PRNGKey(1), (B, 32, 32, 1),
                            jnp.float32)
    x0s = jax.random.normal(jax.random.PRNGKey(2), (B, 32, 32, 3),
                            jnp.float32)
    for split in (False, True):
        fm_m, pm, fm_s, ps = nets(split)
        fx = lambda x, t: fm_m.apply({"params": pm}, x, t)   # noqa: E731
        fy = lambda y, t: fm_s.apply({"params": ps}, y, t)   # noqa: E731
        t_m = _time(jax.jit(lambda a: euler_scan(fx, a, STEPS, unroll=4)),
                    x0m)
        t_s = _time(jax.jit(lambda a: euler_scan(fy, a, STEPS, unroll=4)),
                    x0s)
        tag = "split" if split else "concat"
        out[f"ode_mnist_{tag}_sec"] = round(t_m, 4)
        out[f"ode_svhn_{tag}_sec"] = round(t_s, 4)
        print(f"{tag}: mnist {t_m:.3f}s svhn {t_s:.3f}s", flush=True)

    best_split = (out["ode_svhn_split_sec"] + out["ode_mnist_split_sec"]
                  < out["ode_svhn_concat_sec"] + out["ode_mnist_concat_sec"])
    out["winner"] = "split" if best_split else "concat"

    # full fused sampler with the winner, unroll 4 and 8
    ratio = RatioEstimatorMNISTSVHN(dtype=jnp.bfloat16)
    rv = ratio.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 1)),
                    jnp.zeros((1, 32, 32, 3)))
    fm_m, pm, fm_s, ps = nets(best_split)
    for unroll in (4, 8):
        cfg = GuidedSamplerConfig(
            guidance_method="mc_feng", guidance_strength=0.5,
            num_steps=STEPS, mc_batch_size=256, x_shape=(32, 32, 1),
            y_shape=(32, 32, 3), scan_unroll=unroll)
        sampler = jax.jit(make_guided_sampler_p(
            lambda p, x, t: fm_m.apply({"params": p}, x, t),
            lambda p, y, t: fm_s.apply({"params": p}, y, t), cfg,
            lambda v, x, y: ratio.apply(v, x, y, method=ratio.log_ratio)),
            static_argnums=(2,))
        t = _time(lambda k: sampler((pm, ps, rv), k, B)[0],
                  jax.random.PRNGKey(5))
        out[f"full_sampler_{out['winner']}_unroll{unroll}_sec"] = round(t, 4)
        out[f"full_sampler_{out['winner']}_unroll{unroll}_samples_per_sec"] \
            = round(B / t, 1)
        print(f"full sampler ({out['winner']}, unroll={unroll}): {t:.3f}s "
              f"= {B/t:.1f} samples/s", flush=True)

    os.makedirs("docs/results_r3", exist_ok=True)
    with open("docs/results_r3/opt_experiment.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
