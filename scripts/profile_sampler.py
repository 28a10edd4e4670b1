"""Op-level breakdown of the fused guided sampler (VERDICT r2 #1).

Round 2's headline is 202 samples/s at 2.06% MFU with a plausible-but-
unproven "small convs can't fill the MXU" story. This script produces the
evidence: (a) ablation timings that partition the 2.5s pipeline into
phase A / U-Net x / U-Net y / guidance-math components, (b) an xplane
profile of the warm main loop parsed into a per-op-category time table,
(c) XLA cost-analysis FLOPs per component for an op-by-op roofline.

Run on TPU (one process — the remote-compile cache is per-process):
    PYTHONPATH=/root/repo:$PYTHONPATH python scripts/profile_sampler.py \
        --out docs/results_r3/profile_B512.json

Workload = bench.py headline: MNIST-SVHN pair, B=512, N_mc=256, 100 Euler
steps, bf16 activations (ref workload flow_utils.py:178-375 defaults).
"""
from __future__ import annotations

import argparse
import glob
import json
import os
import time

import jax
import jax.numpy as jnp

from ratio_guided_multimodal_fm_tpu.flow.cfm import euler_scan
from ratio_guided_multimodal_fm_tpu.models import (
    FlowMatchingUNetMNIST,
    FlowMatchingUNetSVHN,
    RatioEstimatorMNISTSVHN,
)
from ratio_guided_multimodal_fm_tpu.sample.guided import (
    GuidedSamplerConfig,
    generate_mc_set,
    make_guided_sampler_p,
    mc_feng_guidance,
)

NUM_STEPS = 100
MC_BATCH = 256
PEAK_FLOPS_BF16 = 197e12


def _sync(x):
    # honest barrier on axon: host readback of a computation-dependent value
    return float(jnp.sum(jnp.asarray(x).ravel()[:1]))


def _time(fn, *args, reps=3, warmups=2):
    for w in range(warmups):
        _sync(fn(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        _sync(out)
        ts.append(time.perf_counter() - t0)
    return min(ts)


def _flops(jitted, *args):
    try:
        ca = jitted.lower(*args).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca.get("flops", 0.0)) or None
    except Exception:
        return None


def build(dtype=jnp.bfloat16):
    fm_m = FlowMatchingUNetMNIST(img_size=32, dtype=dtype)
    fm_s = FlowMatchingUNetSVHN(dtype=dtype)
    ratio = RatioEstimatorMNISTSVHN(dtype=dtype)
    k = jax.random.PRNGKey(0)
    pm = fm_m.init(k, jnp.zeros((1, 32, 32, 1)), jnp.zeros((1,)))["params"]
    ps = fm_s.init(k, jnp.zeros((1, 32, 32, 3)), jnp.zeros((1,)))["params"]
    rv = ratio.init(k, jnp.zeros((1, 32, 32, 1)), jnp.zeros((1, 32, 32, 3)))
    fx = lambda x, t: fm_m.apply({"params": pm}, x, t)      # noqa: E731
    fy = lambda y, t: fm_s.apply({"params": ps}, y, t)      # noqa: E731
    lr = lambda x, y: ratio.apply(rv, x, y,                 # noqa: E731
                                  method=ratio.log_ratio)
    return fx, fy, lr, (pm, ps, rv), (fm_m, fm_s, ratio)


def make_main_ode(fx, fy, lr, method, B, guidance_prec=None):
    """Main phase-B ODE only (mc_set passed in), optionally overriding the
    precision of the guidance matmuls via a local reimplementation."""
    cfg = GuidedSamplerConfig(
        guidance_method=method, guidance_strength=0.5, num_steps=NUM_STEPS,
        mc_batch_size=MC_BATCH, x_shape=(32, 32, 1), y_shape=(32, 32, 3),
        scan_unroll=4)
    sampler = make_guided_sampler_p(
        lambda _, x, t: fx(x, t), lambda _, y, t: fy(y, t), cfg,
        None if method == "none" else (lambda _, x, y: lr(x, y)))

    def run(key, mc_set):
        x1, y1, _ = sampler((None,) * 3, key, B, mc_set=mc_set)
        return x1
    return jax.jit(run, static_argnums=())


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="docs/results_r3/profile_B512.json")
    ap.add_argument("--B", type=int, default=512)
    ap.add_argument("--trace_dir", default="/tmp/r3_trace")
    ap.add_argument("--steps", type=int, default=100,
                    help="override NUM_STEPS (smoke testing)")
    ap.add_argument("--mc", type=int, default=256)
    ap.add_argument("--micro", action="store_true",
                    help="per-layer conv/GN microbench (adds ~25 compiles)")
    args = ap.parse_args()
    B = args.B
    global NUM_STEPS, MC_BATCH
    NUM_STEPS = args.steps
    MC_BATCH = args.mc

    out = {"B": B, "num_steps": NUM_STEPS, "mc_batch": MC_BATCH,
           "backend": jax.default_backend(),
           "device": jax.devices()[0].device_kind}
    fx, fy, lr, params, _models = build()

    key = jax.random.PRNGKey(42)

    # --- components -------------------------------------------------------
    mc_fn = jax.jit(lambda k: generate_mc_set(
        fx, fy, lr, k, MC_BATCH, (32, 32, 1), (32, 32, 3), NUM_STEPS))
    mc = mc_fn(key)
    t_mc = _time(lambda k: mc_fn(k)[2], key)
    out["phase_A_mc_sec"] = round(t_mc, 4)

    # single-modality 100-step scans at batch B (phase-B U-Net cost split)
    x0 = jax.random.normal(key, (B, 32, 32, 1), jnp.float32)
    y0 = jax.random.normal(key, (B, 32, 32, 3), jnp.float32)
    ode_x = jax.jit(lambda x: euler_scan(fx, x, NUM_STEPS, unroll=4))
    ode_y = jax.jit(lambda y: euler_scan(fy, y, NUM_STEPS, unroll=4))
    t_x = _time(ode_x, x0)
    t_y = _time(ode_y, y0)
    out["ode_unet_mnist_sec"] = round(t_x, 4)
    out["ode_unet_svhn_sec"] = round(t_y, 4)
    fl_x = _flops(ode_x, x0)
    fl_y = _flops(ode_y, y0)
    if fl_x:
        out["unet_mnist_mfu_pct"] = round(100 * fl_x / t_x / PEAK_FLOPS_BF16, 2)
    if fl_y:
        out["unet_svhn_mfu_pct"] = round(100 * fl_y / t_y / PEAK_FLOPS_BF16, 2)

    # guidance-math-only scan: same 100 steps, no U-Nets
    def guidance_only(x, y, mc_set):
        def step(carry, i):
            x_t, y_t = carry
            t = i * (1.0 / NUM_STEPS)
            g_x, g_y, _ = mc_feng_guidance(x_t, y_t, mc_set[0], mc_set[1],
                                           mc_set[2], jnp.float32(t))
            return (x_t + g_x * 1e-3, y_t + g_y * 1e-3), ()
        (x_t, y_t), _ = jax.lax.scan(step, (x, y), jnp.arange(NUM_STEPS),
                                     unroll=4)
        return x_t
    g_jit = jax.jit(guidance_only)
    t_g = _time(g_jit, x0, y0, mc)
    out["guidance_math_sec"] = round(t_g, 4)
    fl_g = _flops(g_jit, x0, y0, mc)
    if fl_g:
        out["guidance_math_mfu_pct"] = round(
            100 * fl_g / t_g / PEAK_FLOPS_BF16, 2)
        out["guidance_math_gflops"] = round(fl_g / 1e9, 1)

    # full main ODE (warm MC) and with guidance off
    main_mc = make_main_ode(fx, fy, lr, "mc_feng", B)
    t_main = _time(main_mc, key, mc)
    out["main_ode_mc_feng_sec"] = round(t_main, 4)
    main_none = make_main_ode(fx, fy, lr, "none", B)
    t_none = _time(main_none, key, None)
    out["main_ode_none_sec"] = round(t_none, 4)

    out["decomposition"] = {
        "main_ode": round(t_main, 4),
        "unets_alone_sum": round(t_x + t_y, 4),
        "guidance_alone": round(t_g, 4),
        "unaccounted": round(t_main - t_x - t_y - t_g, 4),
        "guidance_implied_from_none": round(t_main - t_none, 4),
    }

    # --- per-layer microbench: every distinct conv/GN shape in the two
    # U-Nets, timed standalone at batch B — the empirical op-by-op roofline
    # (utilization = FLOPs / time / peak). Conv shapes enumerated from
    # FlexibleUNet (models/unet.py): SVHN ch=64 mult=(1,2,2), MNIST ch=32
    # mult=(1,2), 2 res blocks, decoder sees concatenated skip channels.
    if args.micro:
        from flax import linen as nn

        conv_shapes = [
            # (net, H, Cin, Cout, stride)
            ("svhn", 32, 3, 64, 1), ("svhn", 32, 64, 64, 1),
            ("svhn", 32, 64, 64, 2),                       # downsample
            ("svhn", 16, 64, 128, 1), ("svhn", 16, 128, 128, 1),
            ("svhn", 16, 128, 128, 2),
            ("svhn", 8, 128, 128, 1), ("svhn", 8, 256, 128, 1),
            ("svhn", 16, 256, 128, 1), ("svhn", 32, 128, 64, 1),
            ("svhn", 32, 64, 3, 1),                        # out conv
            ("mnist", 32, 1, 32, 1), ("mnist", 32, 32, 32, 1),
            ("mnist", 32, 32, 32, 2),
            ("mnist", 16, 32, 64, 1), ("mnist", 16, 64, 64, 1),
            ("mnist", 16, 128, 64, 1), ("mnist", 32, 96, 32, 1),
            ("mnist", 32, 64, 32, 1), ("mnist", 32, 32, 1, 1),
        ]
        K = 100   # iterations per program: single-op dispatch through the
                  # axon tunnel is latency-dominated, so each op runs K
                  # times inside one scan with a forced data dependence.

        def scan_op(apply_fn, p, xin):
            def body(s, _):
                y = apply_fn(p, xin * (1.0 + s * 1e-12))
                return jnp.sum(y[0, 0, 0, :1]).astype(jnp.float32), ()
            def run(p, xin):
                s, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=K)
                return s
            return jax.jit(run), (p, xin)

        micro = []
        for net, H, cin, cout, st in conv_shapes:
            conv = nn.Conv(cout, (3, 3), strides=(st, st), padding=1,
                           dtype=jnp.bfloat16)
            xin = jax.random.normal(key, (B, H, H, cin), jnp.bfloat16)
            p = conv.init(jax.random.PRNGKey(0), xin)
            f, fargs = scan_op(lambda p, x, _c=conv: _c.apply(p, x), p, xin)
            t_l = _time(f, *fargs, reps=3) / K
            hout = H // st
            flops = 2 * B * hout * hout * 9 * cin * cout
            micro.append({
                "net": net, "shape": f"{H}x{H}x{cin}->{cout} s{st}",
                "usec": round(t_l * 1e6, 1),
                "gflops": round(flops / 1e9, 2),
                "mxu_util_pct": round(100 * flops / t_l / PEAK_FLOPS_BF16, 2),
            })
        # GroupNorm+SiLU (the per-conv elementwise tax)
        for H, c in [(32, 64), (16, 128), (8, 128), (32, 32), (16, 64)]:
            gn = nn.GroupNorm(num_groups=min(8, c), dtype=jnp.bfloat16)
            xin = jax.random.normal(key, (B, H, H, c), jnp.bfloat16)
            p = gn.init(jax.random.PRNGKey(0), xin)
            f, fargs = scan_op(
                lambda p, x, _g=gn: nn.silu(_g.apply(p, x)), p, xin)
            t_l = _time(f, *fargs, reps=3) / K
            micro.append({
                "net": "gn_silu", "shape": f"{H}x{H}x{c}",
                "usec": round(t_l * 1e6, 1),
                "bytes_gb_s": round(
                    2 * 2 * B * H * H * c / t_l / 1e9, 1),
            })
        out["layer_microbench"] = micro

    # --- xplane trace of the warm main loop ------------------------------
    try:
        os.makedirs(args.trace_dir, exist_ok=True)
        _sync(main_mc(key, mc))
        with jax.profiler.trace(args.trace_dir):
            _sync(main_mc(key, mc))
        table = parse_xplane(args.trace_dir)
        out["op_table"] = table
    except Exception as e:  # noqa: BLE001
        out["op_table_error"] = f"{type(e).__name__}: {e}"

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


def parse_xplane(trace_dir):
    """Aggregate device-plane op durations by category from the newest
    xplane.pb under trace_dir."""
    paths = sorted(glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                             recursive=True), key=os.path.getmtime)
    if not paths:
        return {"error": "no xplane.pb produced"}
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    xs = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as f:
        xs.ParseFromString(f.read())
    planes = {p.name: p for p in xs.planes}
    # pick the device plane (TPU if present, else the busiest non-host one)
    dev = None
    for name, p in planes.items():
        if "TPU" in name or "device" in name.lower():
            dev = p
            break
    if dev is None:
        return {"planes": list(planes), "error": "no device plane"}
    by_name = {}
    total_ps = 0
    for line in dev.lines:
        for ev in line.events:
            md = dev.event_metadata[ev.metadata_id]
            dur = ev.duration_ps
            total_ps += dur
            by_name[md.name] = by_name.get(md.name, 0) + dur
    top = sorted(by_name.items(), key=lambda kv: -kv[1])[:40]
    return {
        "plane": dev.name,
        "total_ms": round(total_ps / 1e9, 3),
        "top_ops_ms": {k: round(v / 1e9, 3) for k, v in top},
    }


if __name__ == "__main__":
    main()
