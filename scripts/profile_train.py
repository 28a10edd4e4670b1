"""Op-level breakdown of the FM train step (VERDICT r4 item 4 follow-up).

bench_details.json's fused K-sweep proved the FM trainer is compute-bound
(dispatch floor 0.86 ms of a 15.3 ms step); this script partitions the
remaining time the way round 3's profile_sampler.py did for sampling:
forward / backward / optimizer phase times via scan-chained programs, a
B-sweep of the backward pass (is low train MFU a small-batch effect?),
and the device-trace op table of the warm fused step.

Run on TPU (one process):
    PYTHONPATH=/root/repo:$PYTHONPATH python scripts/profile_train.py \
        --out docs/results_r5/profile_train.json
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from profile_sampler import parse_xplane  # noqa: E402

from ratio_guided_multimodal_fm_tpu.core.flops import (  # noqa: E402
    svhn_unet_flops,
)
from ratio_guided_multimodal_fm_tpu.flow.cfm import interpolate  # noqa: E402
from ratio_guided_multimodal_fm_tpu.models import (  # noqa: E402
    FlowMatchingUNetSVHN,
)
from ratio_guided_multimodal_fm_tpu.train.steps import (  # noqa: E402
    create_fm_state,
    make_fm_train_multistep,
)

PEAK_FLOPS_BF16 = 197e12
K = 50


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


def make_loss(model, params_treedef_hint=None):
    def loss(params, x1, key):
        kt, kn, kd = jax.random.split(key, 3)
        t = jax.random.uniform(kt, (x1.shape[0],), jnp.float32)
        x_t, u = interpolate(kn, x1, t)
        v = model.apply({"params": params}, x_t, t,
                        deterministic=False, rngs={"dropout": kd})
        return jnp.mean((v.astype(jnp.float32) - u.astype(jnp.float32)) ** 2)
    return loss


def chain_fwd(model, B):
    loss = make_loss(model)

    def run(params, x1, key0):
        def body(s, i):
            k = jax.random.fold_in(key0, i)
            l = loss(params, x1 * (1.0 + s * 1e-12), k)
            return l.astype(jnp.float32), ()
        s, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(K))
        return s
    return jax.jit(run)


def chain_grad(model, B):
    loss = make_loss(model)
    gfn = jax.value_and_grad(loss)

    def run(params, x1, key0):
        def body(s, i):
            k = jax.random.fold_in(key0, i)
            l, g = gfn(params, x1 * (1.0 + s * 1e-12), k)
            # depend on the gradients so backward cannot be DCE'd
            gnorm = sum(jnp.sum(jnp.abs(x).astype(jnp.float32))
                        for x in jax.tree_util.tree_leaves(g))
            return (l + 1e-20 * gnorm).astype(jnp.float32), ()
        s, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(K))
        return s
    return jax.jit(run)


def chain_fwd_variant(model, variant):
    """fwd-loss timing variants isolating the non-conv costs:
    'train'  = dropout on + interpolate RNG (the real loss fwd)
    'det'    = dropout OFF, interpolate RNG kept
    'pure'   = no RNG at all: fixed x_t, t — the sampler's regime."""

    def run(params, x1, key0):
        def body(s, i):
            k = jax.random.fold_in(key0, i)
            x = x1 * (1.0 + s * 1e-12)
            if variant == "pure":
                t = jnp.full((x.shape[0],), 0.5, jnp.float32)
                v = model.apply({"params": params}, x, t,
                                deterministic=True)
                l = jnp.mean(v.astype(jnp.float32) ** 2)
            else:
                kt, kn, kd = jax.random.split(k, 3)
                t = jax.random.uniform(kt, (x.shape[0],), jnp.float32)
                x_t, u = interpolate(kn, x, t)
                if variant == "det":
                    v = model.apply({"params": params}, x_t, t,
                                    deterministic=True)
                else:
                    v = model.apply({"params": params}, x_t, t,
                                    deterministic=False,
                                    rngs={"dropout": kd})
                l = jnp.mean(
                    (v.astype(jnp.float32) - u.astype(jnp.float32)) ** 2)
            return l.astype(jnp.float32), ()
        s, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(K))
        return s
    return jax.jit(run)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="docs/results_r5/profile_train.json")
    ap.add_argument("--trace_dir", default="/tmp/r5_train_trace")
    ap.add_argument("--smoke", action="store_true",
                    help="tiny shapes / short chains (CPU correctness run)")
    ap.add_argument("--variants_only", action="store_true",
                    help="run only the fwd-variant sweep (fast follow-up)")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (the axon sitecustomize "
                         "ignores JAX_PLATFORMS env; backends init lazily "
                         "so jax.config still works here)")
    args = ap.parse_args()
    global K
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    if args.smoke:
        K = 3

    model = FlowMatchingUNetSVHN(dtype=jnp.bfloat16)
    key = jax.random.PRNGKey(0)
    out = {"backend": jax.default_backend(),
           "device": jax.devices()[0].device_kind,
           "model": "FlowMatchingUNetSVHN bf16", "chain_K": K}

    st = create_fm_state(model, jax.random.PRNGKey(12), (32, 32, 3), lr=1e-4)
    phases = {}
    for B in (() if args.variants_only else
              (8,) if args.smoke else (128, 512)):
        x1 = jax.random.normal(key, (B, 32, 32, 3), jnp.float32)
        F = svhn_unet_flops(B)
        t_f = _time(chain_fwd(model, B), st.params, x1,
                    jax.random.PRNGKey(1)) / K
        t_g = _time(chain_grad(model, B), st.params, x1,
                    jax.random.PRNGKey(2)) / K
        row = {
            "fwd_ms": round(t_f * 1e3, 3),
            "fwd_mfu_pct": round(100 * F / t_f / PEAK_FLOPS_BF16, 2),
            "grad_ms": round(t_g * 1e3, 3),
            "grad_mfu_pct": round(100 * 3 * F / t_g / PEAK_FLOPS_BF16, 2),
            "bwd_ms_implied": round((t_g - t_f) * 1e3, 3),
            "bwd_mfu_pct_implied": round(
                100 * 2 * F / (t_g - t_f) / PEAK_FLOPS_BF16, 2),
        }
        phases[f"B={B}"] = row
        print(B, row, flush=True)
    out["phases"] = phases

    # fwd variants at B=128: where do the fwd's missing MFU points go?
    B = 8 if args.smoke else 128
    x1 = jax.random.normal(key, (B, 32, 32, 3), jnp.float32)
    F = svhn_unet_flops(B)
    variants = {}
    for v in ("train", "det", "pure", "train_rbg"):
        # 'train_rbg': same dropout-on loss, but the key (hence every
        # split/fold_in/dropout mask) uses the XLA RngBitGenerator PRNG
        # instead of threefry — the candidate fix if dropout RNG is the
        # fwd-MFU tax.
        impl = "rbg" if v == "train_rbg" else None
        k0 = (jax.random.key(9, impl="rbg") if impl
              else jax.random.PRNGKey(9))
        body = "train" if v == "train_rbg" else v
        t_v = _time(chain_fwd_variant(model, body), st.params, x1, k0) / K
        variants[v] = {"ms": round(t_v * 1e3, 3),
                       "mfu_pct": round(100 * F / t_v / PEAK_FLOPS_BF16, 2)}
        print("fwd variant", v, variants[v], flush=True)
    # grad with each key family: does the backward carry the RNG tax too
    # (XLA remats threefry masks in bwd) or are masks saved?
    for v, k0 in (("grad", jax.random.PRNGKey(9)),
                  ("grad_rbg", jax.random.key(9, impl="rbg"))):
        t_v = _time(chain_grad(model, B), st.params, x1, k0) / K
        variants[v] = {"ms": round(t_v * 1e3, 3),
                       "mfu_pct": round(
                           100 * 3 * F / t_v / PEAK_FLOPS_BF16, 2)}
        print("fwd variant", v, variants[v], flush=True)
    out["fwd_variants_B128"] = variants
    if args.variants_only:
        os.makedirs(os.path.dirname(args.out), exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)
        print("wrote", args.out)
        return

    # full fused step (grad + adam + loss logging) at B=128, K steps/program
    B = 8 if args.smoke else 128
    ds = jax.random.normal(key, (4096, 32, 32, 3), jnp.float32)
    mstep = make_fm_train_multistep(model)
    idx = jax.random.randint(jax.random.PRNGKey(7), (K, B), 0, 4096,
                             jnp.int32)
    st2 = create_fm_state(model, jax.random.PRNGKey(12), (32, 32, 3),
                          lr=1e-4)
    st2, l = mstep(st2, ds, idx, jax.random.PRNGKey(3))   # compile
    _sync((l[None],))
    st2, l = mstep(st2, ds, idx, jax.random.PRNGKey(4))   # warm
    _sync((l[None],))
    t0 = time.perf_counter()
    st2, l = mstep(st2, ds, idx, jax.random.PRNGKey(5))
    _sync((l[None],))
    t_step = (time.perf_counter() - t0) / K
    F = svhn_unet_flops(B)
    out["full_step_B128"] = {
        "step_ms": round(t_step * 1e3, 3),
        "step_mfu_pct": round(100 * 3 * F / t_step / PEAK_FLOPS_BF16, 2),
        "opt_overhead_ms_implied": round(
            (t_step - phases[f"B={B}"]["grad_ms"] / 1e3) * 1e3, 3),
    }
    print("full step", out["full_step_B128"], flush=True)

    # device trace of one warm fused program
    try:
        os.makedirs(args.trace_dir, exist_ok=True)
        with jax.profiler.trace(args.trace_dir):
            st2, l = mstep(st2, ds, idx, jax.random.PRNGKey(6))
            _sync((l[None],))
        out["op_table"] = parse_xplane(args.trace_dir)
    except Exception as e:  # noqa: BLE001
        out["op_table_error"] = f"{type(e).__name__}: {e}"

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
