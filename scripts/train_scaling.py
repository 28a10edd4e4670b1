"""Train-step throughput & MFU vs batch size on the real chip.

bench.py reports train steps/s at the reference's own default (B=128) for
baseline parity; this experiment answers the follow-on question — is the
33% train MFU at B=128 a framework limit or just a small batch? — by
sweeping B for both train-step families:

  * FM (FlowMatchingUNetSVHN, 6.07M params, bf16 activations)
  * ratio (RatioEstimatorMNISTSVHN, 3.33M params, BatchNorm threading)

MFU uses the analytic forward-FLOP count x3 (fwd + ~2x bwd), the same
convention as bench.py. Timing drains through a host readback (axon's
block_until_ready returns early — CLAUDE.md).

Writes docs/results_r3/train_batch_scaling.json. Run on TPU — gate with
the CLAUDE.md preflight loop first (tpu_run_stage.sh only adds the
wedge watchdog, not the free-chip check), with the repo on PYTHONPATH:
  export PYTHONPATH=/root/repo:$PYTHONPATH
  # preflight: timeout 60 python -c "import jax,jax.numpy as jnp; ..."
  bash scripts/tpu_run_stage.sh train_scaling /root/repo \
      python scripts/train_scaling.py
"""
from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp

from ratio_guided_multimodal_fm_tpu.core.flops import svhn_unet_flops
from ratio_guided_multimodal_fm_tpu.models import (
    FlowMatchingUNetSVHN,
    RatioEstimatorMNISTSVHN,
)
from ratio_guided_multimodal_fm_tpu.train.steps import (
    create_fm_state,
    create_ratio_state,
    make_fm_train_step,
    make_ratio_train_step,
)

PEAK = 197e12
BATCHES = (128, 256, 512, 1024)
REPS = 20


def _sync(x):
    return float(jnp.sum(jnp.asarray(x)))


def _rate(step_fn, state, args_fn):
    st = state
    for w in range(3):
        st, aux = step_fn(st, *args_fn(w))
        _sync(aux["loss"] if isinstance(aux, dict) else aux)
    t0 = time.perf_counter()
    for i in range(REPS):
        st, aux = step_fn(st, *args_fn(3 + i))
    _sync(aux["loss"] if isinstance(aux, dict) else aux)
    return REPS / (time.perf_counter() - t0)


def main():
    out = {"hardware": f"{jax.devices()[0].device_kind}, 1 chip",
           "dtype": "bf16 activations / f32 params",
           "reps": REPS, "fm": {}, "ratio": {}}

    fm = FlowMatchingUNetSVHN(dtype=jnp.bfloat16)
    fm_step = make_fm_train_step(fm)
    ratio = RatioEstimatorMNISTSVHN(dtype=jnp.bfloat16)
    r_step = make_ratio_train_step(ratio, "disc", has_batch_stats=True)

    for b in BATCHES:
        # Fresh states per batch size: the jitted steps donate their state
        # argument, so a state consumed at B=128 is deleted for B=256.
        fm_state = create_fm_state(fm, jax.random.PRNGKey(0), (32, 32, 3),
                                   lr=1e-4)
        r_state = create_ratio_state(ratio, jax.random.PRNGKey(1),
                                     (32, 32, 1), (32, 32, 3), lr=1e-4,
                                     has_batch_stats=True)
        k = jax.random.PRNGKey(b)
        xb = jax.random.normal(k, (b, 32, 32, 3), jnp.float32)
        rate = _rate(fm_step, fm_state,
                     lambda i: (xb, jax.random.PRNGKey(100 + i)))
        mfu = 100.0 * 3.0 * svhn_unet_flops(b) * rate / PEAK
        out["fm"][f"B={b}"] = {"steps_per_sec": round(rate, 2),
                               "samples_per_sec": round(rate * b, 1),
                               "mfu_pct": round(mfu, 2)}
        print("fm", b, out["fm"][f"B={b}"], flush=True)

        xr = jax.random.normal(k, (b, 32, 32, 1), jnp.float32)
        yr = jax.random.normal(k, (b, 32, 32, 3), jnp.float32)
        ir = (jnp.arange(b) % 2).astype(jnp.float32)
        rrate = _rate(r_step, r_state,
                      lambda i: (xr, yr, ir, jax.random.PRNGKey(200 + i)))
        out["ratio"][f"B={b}"] = {"steps_per_sec": round(rrate, 2),
                                  "samples_per_sec": round(rrate * b, 1)}
        print("ratio", b, out["ratio"][f"B={b}"], flush=True)

    out["date"] = time.strftime("%Y-%m-%d")
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "docs/results_r3",
        "train_batch_scaling.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print("->", path, flush=True)


if __name__ == "__main__":
    main()
