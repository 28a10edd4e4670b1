"""GroupNorm+SiLU optimization experiment (the measured MFU ceiling).

profile_B512.json evidence: in the 1.56s main ODE, GN statistics passes
(convert_reduce_fusion) take 858ms and generic elementwise fusions 523ms,
while ALL convolutions take 69ms. GN+SiLU microbenches at 115-210 GB/s —
15-25% of the v5e's ~819 GB/s HBM peak — and costs MORE than the convs it
wraps. This script races GN+SiLU formulations at the two hot shapes and
then re-times the SVHN ODE scan with the winner patched in.

Variants:
  flax      nn.GroupNorm(8) + silu                      (current, baseline)
  hand_f32  reshape → f32 mean/var → normalize+affine+silu, one expression
  hand_bf16 same but statistics in bf16 (half the stats-pass bytes)
  pallas    fused single-pass kernel (ops/groupnorm_pallas.py): per-sample
            group stats and normalize+silu from ONE HBM read

Run (TPU): PYTHONPATH=/root/repo:$PYTHONPATH python scripts/gn_experiment.py
Output: docs/results_r3/gn_experiment.json
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

PEAK_BW = 819e9  # v5e HBM bytes/sec


def _sync(x):
    return float(jnp.sum(jnp.asarray(x).ravel()[:1]))


def _time_scan(apply_fn, xin, K=100, reps=3):
    """Time apply_fn inside a K-iteration scan with forced data dependence
    (single-op dispatch through the axon tunnel is latency-dominated)."""
    def body(s, _):
        y = apply_fn(xin * (1.0 + s * 1e-12))
        return jnp.sum(y[0, 0, 0, :1]).astype(jnp.float32), ()

    @jax.jit
    def run():
        s, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=K)
        return s

    for _ in range(2):
        _sync(run())
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        _sync(run())
        ts.append(time.perf_counter() - t0)
    return min(ts) / K


def hand_gn_silu(x, scale, bias, groups, eps=1e-6, stat_dtype=jnp.float32):
    B, H, W, C = x.shape
    cg = C // groups
    xr = x.reshape(B, H * W, groups, cg).astype(stat_dtype)
    mean = jnp.mean(xr, axis=(1, 3), keepdims=True)
    var = jnp.mean(jnp.square(xr - mean), axis=(1, 3), keepdims=True)
    y = (xr - mean) * jax.lax.rsqrt(var + eps)
    y = y.reshape(B, H, W, C).astype(x.dtype)
    y = y * scale[None, None, None, :] + bias[None, None, None, :]
    return nn.silu(y)


def main():
    out = {"device": jax.devices()[0].device_kind}
    shapes = [(512, 32, 32, 64), (512, 16, 16, 128), (512, 32, 32, 32),
              (256, 32, 32, 64)]
    results = []
    for (B, H, W, C) in shapes:
        g = min(8, C)
        x = jax.random.normal(jax.random.PRNGKey(0), (B, H, W, C),
                              jnp.bfloat16)
        scale = jnp.ones((C,), jnp.bfloat16)
        bias = jnp.zeros((C,), jnp.bfloat16)
        row = {"shape": f"{B}x{H}x{W}x{C}", "groups": g}
        bytes_2pass = 2 * 2 * B * H * W * C  # read+write bf16, one pass each

        gn = nn.GroupNorm(num_groups=g, dtype=jnp.bfloat16)
        p = gn.init(jax.random.PRNGKey(1), x)
        t = _time_scan(lambda a, _p=p, _g=gn: nn.silu(_g.apply(_p, a)), x)
        row["flax_usec"] = round(t * 1e6, 1)

        t = _time_scan(lambda a: hand_gn_silu(a, scale, bias, g), x)
        row["hand_f32_usec"] = round(t * 1e6, 1)

        t = _time_scan(lambda a: hand_gn_silu(a, scale, bias, g,
                                              stat_dtype=jnp.bfloat16), x)
        row["hand_bf16_usec"] = round(t * 1e6, 1)

        try:
            from ratio_guided_multimodal_fm_tpu.ops.groupnorm_pallas import (
                group_norm_silu,
            )
            f = jax.jit(lambda a: group_norm_silu(a, scale, bias, g))
            # correctness vs flax at f32 tolerance
            ref = nn.silu(gn.apply(p, x))
            got = f(x)
            err = float(jnp.max(jnp.abs(got.astype(jnp.float32)
                                        - ref.astype(jnp.float32))))
            row["pallas_max_abs_err"] = round(err, 5)
            t = _time_scan(lambda a: group_norm_silu(a, scale, bias, g), x)
            row["pallas_usec"] = round(t * 1e6, 1)
        except Exception as e:  # noqa: BLE001
            row["pallas_error"] = f"{type(e).__name__}: {e}"[:300]

        for k in list(row):
            if k.endswith("_usec"):
                row[k.replace("_usec", "_gb_s")] = round(
                    bytes_2pass / (row[k] / 1e6) / 1e9, 1)
        results.append(row)
        print(row, flush=True)
    out["gn_variants"] = results

    # end-to-end effect: SVHN ODE scan with each GN implementation
    from ratio_guided_multimodal_fm_tpu.flow.cfm import euler_scan
    from ratio_guided_multimodal_fm_tpu.models import FlowMatchingUNetSVHN

    def time_ode(B=512):
        fm = FlowMatchingUNetSVHN(dtype=jnp.bfloat16)
        pm = fm.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)),
                     jnp.zeros((1,)))["params"]
        fx = lambda xx, tt: fm.apply({"params": pm}, xx, tt)  # noqa: E731
        x0 = jax.random.normal(jax.random.PRNGKey(1), (B, 32, 32, 3),
                               jnp.float32)
        f = jax.jit(lambda a: euler_scan(fx, a, 100, unroll=4))
        for _ in range(2):
            _sync(f(x0))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            _sync(f(x0))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    import ratio_guided_multimodal_fm_tpu.models.layers as layers
    for impl in ("flax", "pallas"):
        try:
            layers.set_gn_impl(impl)
            out[f"svhn_ode_{impl}_sec"] = round(time_ode(), 4)
            print(f"svhn ODE with GN impl={impl}:",
                  out[f"svhn_ode_{impl}_sec"], "s", flush=True)
        except Exception as e:  # noqa: BLE001
            out[f"svhn_ode_{impl}_error"] = str(e)[:300]
    layers.set_gn_impl("auto")

    os.makedirs("docs/results_r3", exist_ok=True)
    with open("docs/results_r3/gn_experiment.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
