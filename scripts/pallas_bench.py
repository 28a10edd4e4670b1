"""Pallas flash-guidance kernel vs the XLA matmul path, on real TPU.

Round-1 verdict: the old VMEM-resident kernel lost to XLA (927us vs 795us at
its only supported shape) — "make the Pallas kernel pay or retire it". This
sweep decides: times one guidance step at a grid of (B, N_mc) shapes,
checks numerical agreement, and writes docs/results_r2/pallas_bench.json.

Run (TPU, exclusive): python scripts/pallas_bench.py
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, REPO)

X_SHAPE = (32, 32, 1)
Y_SHAPE = (32, 32, 3)
BS = (64, 512)
NS = (256, 1024, 4096, 16384)
REPS = 10


SCAN_ITERS = 50


def timeit_scanned(step_fn, x_t, y_t, *rest):
    """Per-step time of `step_fn` inside ONE jitted scan with a data
    dependency (x_t feeds back) — the axon tunnel adds a ~28ms dispatch
    floor per host call, so single-op timing is meaningless; this measures
    the op the way the sampler actually runs it (inside lax.scan)."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(x0, y0, *r):
        # MC arrays enter as jit ARGUMENTS — closure capture embeds them as
        # constants and the remote compiler rejects >~100MB modules (413).
        def body(carry, _):
            x, y = carry
            out = step_fn(x, y, *r)
            gx, gy = out[0], out[1]
            return (x + 1e-6 * gx, y + 1e-6 * gy), ()

        (xf, yf), _ = jax.lax.scan(body, (x0, y0),
                                   jnp.arange(SCAN_ITERS))
        return xf, yf

    def sync(o):
        # host readback of a dependent scalar = the only reliable
        # barrier on the axon backend (block_until_ready returns early)
        return float(jnp.sum(o[0][:1]))

    sync(run(x_t, y_t, *rest))
    sync(run(x_t, y_t, *rest))
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        out = run(x_t, y_t, *rest)
        sync(out)
        ts.append(time.perf_counter() - t0)
    return min(ts) / SCAN_ITERS


def main() -> None:
    import jax
    import jax.numpy as jnp

    from ratio_guided_multimodal_fm_tpu.ops.guidance_pallas import (
        flash_guidance,
    )
    from ratio_guided_multimodal_fm_tpu.sample.guided import mc_feng_guidance

    rows = []
    xla_jit = jax.jit(mc_feng_guidance)
    t = jnp.float32(0.7)
    for B in BS:
        for N in NS:
            k = jax.random.PRNGKey(B * 100000 + N)
            kx, ky, kmx, kmy, kr = jax.random.split(k, 5)
            x_t = jax.random.normal(kx, (B,) + X_SHAPE, jnp.float32)
            y_t = jax.random.normal(ky, (B,) + Y_SHAPE, jnp.float32)
            mc_x = jax.random.normal(kmx, (N,) + X_SHAPE, jnp.float32)
            mc_y = jax.random.normal(kmy, (N,) + Y_SHAPE, jnp.float32)
            log_r = jax.random.normal(kr, (N,), jnp.float32)

            t_xla = timeit_scanned(
                lambda x, y, mx, my, r: mc_feng_guidance(x, y, mx, my, r, t),
                x_t, y_t, mc_x, mc_y, jnp.exp(log_r))
            t_pal = timeit_scanned(
                lambda x, y, mx, my, r: flash_guidance(x, y, mx, my, r, t),
                x_t, y_t, mc_x, mc_y, log_r)

            gx_a, gy_a, d = xla_jit(x_t, y_t, mc_x, mc_y, jnp.exp(log_r), t)
            gx_b, gy_b, ess_b, _ = flash_guidance(x_t, y_t, mc_x, mc_y,
                                                  log_r, t)
            scale = float(jnp.max(jnp.abs(gx_a))) + 1e-8
            err = float(jnp.max(jnp.abs(gx_a - gx_b))) / scale
            ess_err = float(jnp.max(jnp.abs(d["ess"] - ess_b)))
            rows.append({
                "B": B, "N_mc": N,
                "xla_us": round(t_xla * 1e6, 1),
                "pallas_us": round(t_pal * 1e6, 1),
                "speedup": round(t_xla / t_pal, 3),
                "rel_err_gx": float(f"{err:.2e}"),
                "ess_abs_err": float(f"{ess_err:.2e}"),
            })
            print(rows[-1], flush=True)

    out = {
        "hardware": f"{jax.devices()[0].device_kind}",
        "what": "one mc_feng guidance step, 32x32 MNIST-SVHN shapes, f32",
        "date": time.strftime("%Y-%m-%d"),
        "rows": rows,
    }
    dst = os.path.join(REPO, "docs", "results_r2")
    os.makedirs(dst, exist_ok=True)
    with open(os.path.join(dst, "pallas_bench.json"), "w") as f:
        json.dump(out, f, indent=2)
    print("wrote docs/results_r2/pallas_bench.json")


if __name__ == "__main__":
    main()
