"""Tier-C verdict bench: fused GN+SiLU+conv3x3 mega-kernel vs XLA.

mfu_roofline.json's ~81% ceiling assumes per-ResBlock mega-kernels.
ops/resblock_pallas.py IS that kernel for the half-ResBlock unit; this
script measures it against the XLA composition on the v5e at the U-Net's
hot shapes and records the pay-or-retire verdict (VERDICT r4 item 8).

Timing protocol: single-op dispatch through the axon tunnel is
latency-dominated (~26 ms/call measured in the first run of this script —
every shape returned the same number), so each op runs K=100 times inside
one `lax.scan` with a forced data dependence and the program time is
divided by K — the same protocol as profile_sampler.py's layer
microbench. The single-dispatch number is also recorded as evidence of
the tunnel floor.

Run on TPU (one process):
    PYTHONPATH=/root/repo:$PYTHONPATH python scripts/resblock_kernel_bench.py \
        --out docs/results_r5/resblock_kernel_bench.json
"""
from __future__ import annotations

import argparse
import functools
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from ratio_guided_multimodal_fm_tpu.ops.resblock_pallas import (
    fused_gn_silu_conv,
    reference_gn_silu_conv,
)

PEAK_FLOPS_BF16 = 197e12
PEAK_HBM_GBS = 819.0
K = 100


def _sync(x):
    # honest barrier on axon: host readback of a computation-dependent value
    return float(jnp.sum(jnp.asarray(x).ravel()[:1].astype(jnp.float32)))


def _time(fn, *args, reps=3, warmups=2):
    for _ in range(warmups):
        _sync(fn(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        _sync(out)
        ts.append(time.perf_counter() - t0)
    return min(ts)


def _chain(apply_fn):
    """K applications in one program; dependence via the scalar carry so
    XLA cannot CSE the iterations (profile_sampler.py protocol)."""

    def run(x, *params):
        def body(s, _):
            y = apply_fn(x * (1.0 + s * 1e-12), *params)
            return jnp.sum(y[0, 0, 0, :1]).astype(jnp.float32), ()

        s, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=K)
        return s

    return jax.jit(run)


def bench_shape(B, H, W, C, O, groups, dtype=jnp.bfloat16):
    r = np.random.RandomState(0)
    x = jnp.asarray(r.randn(B, H, W, C), dtype)
    sc = jnp.asarray(1.0 + 0.1 * r.randn(C), jnp.float32)
    bi = jnp.asarray(0.1 * r.randn(C), jnp.float32)
    w = jnp.asarray(0.2 * r.randn(3, 3, C, O), jnp.float32)
    cb = jnp.asarray(0.1 * r.randn(O), jnp.float32)

    row = {"shape": f"{B}x{H}x{W}x{C}->{O}", "groups": groups,
           "dtype": str(dtype.__name__), "chain_K": K}
    bpe = 2 if dtype == jnp.bfloat16 else 4
    ideal_bytes = B * H * W * (C + O) * bpe           # one read + one write
    conv_flops = 2.0 * B * H * W * 9 * C * O

    ref = jax.jit(lambda *a: reference_gn_silu_conv(*a, groups=groups))
    row["xla_dispatch_usec"] = round(_time(ref, x, sc, bi, w, cb) * 1e6, 1)
    ref_chain = _chain(lambda xx, *p: reference_gn_silu_conv(
        xx, *p, groups=groups))
    t_ref = _time(ref_chain, x, sc, bi, w, cb) / K
    row["xla_usec"] = round(t_ref * 1e6, 1)
    row["xla_gb_s"] = round(ideal_bytes / t_ref / 1e9, 1)
    row["xla_mfu_pct"] = round(100.0 * conv_flops / t_ref / PEAK_FLOPS_BF16,
                               2)

    for tile_b in (4, 8):
        key = f"pallas_tb{tile_b}"
        try:
            kern = functools.partial(fused_gn_silu_conv, groups=groups,
                                     tile_b=tile_b)
            kern_chain = _chain(lambda xx, *p: kern(xx, *p))
            t_k = _time(kern_chain, x, sc, bi, w, cb) / K
            # parity spot-check on the first rows (bf16 tolerance)
            got = np.asarray(kern(x, sc, bi, w, cb)[:2], np.float32)
            want = np.asarray(ref(x, sc, bi, w, cb)[:2], np.float32)
            err = float(np.max(np.abs(got - want)))
            row[f"{key}_usec"] = round(t_k * 1e6, 1)
            row[f"{key}_gb_s"] = round(ideal_bytes / t_k / 1e9, 1)
            row[f"{key}_mfu_pct"] = round(
                100.0 * conv_flops / t_k / PEAK_FLOPS_BF16, 2)
            row[f"{key}_max_abs_err"] = round(err, 5)
        except Exception as e:  # noqa: BLE001 — record compile failures
            row[f"{key}_error"] = str(e)[:400]
    return row


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="docs/results_r5/resblock_kernel_bench.json")
    args = ap.parse_args()

    print("backend:", jax.default_backend(), flush=True)
    rows = []
    for shape in ((512, 32, 32, 64, 64, 8),
                  (512, 16, 16, 128, 128, 8),
                  (512, 32, 32, 32, 64, 8)):
        print("bench", shape, flush=True)
        row = bench_shape(*shape)
        print(" ", row, flush=True)
        rows.append(row)

    out = {"device": jax.devices()[0].device_kind, "rows": rows,
           "protocol": f"K={K} chained applications per program "
                       "(scan, forced data dependence); usec = program/K"}
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
