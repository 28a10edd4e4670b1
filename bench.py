"""Benchmark: guided pair sampling throughput on the flagship MNIST-SVHN
config (BASELINE.json metric: guided pair samples/sec/chip at 100 ODE steps).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "samples/sec/chip", "vs_baseline": N,
   "mfu_pct": ...}

Headline workload = the reference's own end-to-end eval unit
(evaluate_mnist_svhn.py defaults: ~500 samples per config, N_mc=256,
100 Euler steps): B=512 guided pairs through the FULL pipeline — MC phase A
(2x256-chain Euler) + guided phase B — as one jitted program. A B-sweep
(64/256/512/1024) and the phase split are written to bench_details.json,
with MFU computed from the ANALYTIC conv/dense FLOP count
(core/flops.py) against the v5e bf16 peak (197 TFLOP/s). Round 2 computed
MFU from compiled.cost_analysis(), which drops the lax.scan trip count and
under-reported by ~25x (2.06% published for a ~57%-MFU program) — see
docs/results_r3/mfu_roofline.json for the correction and the roofline.

vs_baseline compares against the reference PyTorch implementation's CPU
throughput for the same workload (the reference publishes no numbers —
BASELINE.md directs us to measure it). The measured baseline is stored in
bench_baseline.json; regenerate with `python bench.py --measure-baseline`
(runs the reference's sampler at /root/reference on torch CPU with
randomly-initialized models — throughput is weight-independent, and per-
sample throughput is batch-independent on CPU: time is linear in B).
"""
from __future__ import annotations

import json
import os
import sys
import time

NUM_STEPS = 100
MC_BATCH = 256
HEADLINE_B = 512
SWEEP_B = (64, 256, 512, 1024)
PEAK_FLOPS_BF16 = 197e12  # TPU v5e single chip
BASELINE_FILE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "bench_baseline.json")
DETAILS_FILE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "bench_details.json")


def _build_sampler(scan_unroll: int = 1, method: str = "mc_feng",
                   num_steps: int = NUM_STEPS, solver: str = "euler"):
    import jax
    import jax.numpy as jnp

    from ratio_guided_multimodal_fm_tpu.models import (
        FlowMatchingUNetMNIST,
        FlowMatchingUNetSVHN,
        RatioEstimatorMNISTSVHN,
    )
    from ratio_guided_multimodal_fm_tpu.sample.guided import (
        GuidedSamplerConfig,
        make_guided_sampler_p,
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
        guidance_method=method, guidance_strength=0.5,
        num_steps=num_steps, mc_batch_size=MC_BATCH,
        x_shape=(32, 32, 1), y_shape=(32, 32, 3), scan_unroll=scan_unroll,
        solver=solver)

    sampler = jax.jit(
        make_guided_sampler_p(
            lambda p, x, t: fm_m.apply({"params": p}, x, t),
            lambda p, y, t: fm_s.apply({"params": p}, y, t),
            cfg,
            lambda v, x, y: ratio.apply(v, x, y, method=ratio.log_ratio)),
        static_argnums=(2,))
    params = (pm, ps, rv)
    return sampler, params


def _sync(out):
    """Execution barrier that actually works on the axon backend.

    jax.block_until_ready returns ~immediately there (measured: 'blocked'
    in 1.7ms while the execution needed 171s to produce bytes) — so every
    timing must drain through a host readback of a value that depends on
    the computation. A device-side scalar reduce keeps the transfer tiny.
    """
    import jax.numpy as jnp

    return float(jnp.sum(out[0][:1]))


def _time_config(sampler, params, batch: int, reps: int = 3):
    import jax

    for w in range(2):  # 2 warmups: compile/load on the 1st, caches on 2nd
        _sync(sampler(params, jax.random.PRNGKey(1 + w), batch))
    times = []
    for i in range(reps):
        t0 = time.perf_counter()
        out = sampler(params, jax.random.PRNGKey(3 + i), batch)
        _sync(out)
        times.append(time.perf_counter() - t0)
    return min(times)


def _flops_of(batch: int):
    """Analytic FLOPs of the full guided-sampler program.

    Round 2 used `compiled.cost_analysis()["flops"]`, which does NOT
    multiply the lax.scan body by its trip count on this backend — the
    published 2.06% MFU was a ~25× under-count of a sampler actually
    running near 60% (cross-checked against per-layer conv FLOPs, the
    measured step time, and the fused-conv contents of the device trace:
    docs/results_r3/mfu_roofline.json). core/flops.py owns the closed-form
    count now.
    """
    from ratio_guided_multimodal_fm_tpu.core.flops import (
        guided_sampler_flops,
    )

    return guided_sampler_flops(batch, MC_BATCH, NUM_STEPS)


def fast_operating_point() -> dict:
    """The recommended FAST operating point (measured separately by
    scripts/solver_bench.py on the same workload; quality parity shown in
    docs/results_r3/solver_study.json). Copied into bench_details, not
    re-timed — the headline stays on the reference's euler-100 protocol."""
    sb = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "docs", "results_r3", "solver_bench.json")
    if not os.path.exists(sb):
        return {}
    with open(sb) as f:
        cfgs = json.load(f).get("configs", {})
    if "midpoint-12" in cfgs:
        return {
            "config": "--solver midpoint --num_steps 12",
            **cfgs["midpoint-12"],
            "quality": "guided coherence 0.828 vs euler-100's 0.824 "
                       "(n=512, within noise) — solver_study.json",
        }
    if "midpoint-25" not in cfgs:
        return {}
    return {
        "config": "--solver midpoint --num_steps 25",
        **cfgs["midpoint-25"],
        "quality": "guided coherence 0.832 vs euler-100's 0.824 "
                   "(n=512, within noise) — solver_study.json",
    }


def run_tpu_bench() -> dict:
    import jax

    details = {
        "hardware": f"{jax.devices()[0].device_kind}, 1 chip",
        "workload": {"num_steps": NUM_STEPS, "mc_batch_size": MC_BATCH,
                     "dtype": "bf16 activations / f32 guidance math"},
        "peak_flops_bf16": PEAK_FLOPS_BF16,
    }

    # unroll selection at the headline batch
    unroll_results = {}
    best_unroll, best_t = 1, float("inf")
    for unroll in (1, 4):
        sampler, params = _build_sampler(scan_unroll=unroll)
        t = _time_config(sampler, params, HEADLINE_B)
        unroll_results[f"unroll={unroll}"] = round(HEADLINE_B / t, 1)
        if t < best_t:
            best_unroll, best_t = unroll, t
    details["unroll_sweep_B512_samples_per_sec"] = unroll_results

    sampler, params = _build_sampler(scan_unroll=best_unroll)
    details["scan_unroll"] = best_unroll

    sweep = {}
    mfu = {}
    for b in SWEEP_B:
        t = _time_config(sampler, params, b)
        sweep[f"B={b}"] = round(b / t, 1)
        fl = _flops_of(b)
        if fl:
            mfu[f"B={b}"] = round(100.0 * fl / t / PEAK_FLOPS_BF16, 2)
    details["batch_sweep_samples_per_sec"] = sweep
    details["mfu_pct"] = mfu

    # phase split at the headline batch: main ODE alone (warm MC set) vs full
    from ratio_guided_multimodal_fm_tpu.sample.guided import generate_mc_set

    import jax.numpy as jnp  # noqa: F401

    sampler_p, params_p = sampler, params
    pm, ps, rv = params_p
    from ratio_guided_multimodal_fm_tpu.models import (
        FlowMatchingUNetMNIST,
        FlowMatchingUNetSVHN,
        RatioEstimatorMNISTSVHN,
    )
    fm_m = FlowMatchingUNetMNIST(img_size=32, dtype=jnp.bfloat16)
    fm_s = FlowMatchingUNetSVHN(dtype=jnp.bfloat16)
    ratio = RatioEstimatorMNISTSVHN(dtype=jnp.bfloat16)
    mc = generate_mc_set(
        lambda x, t: fm_m.apply({"params": pm}, x, t),
        lambda y, t: fm_s.apply({"params": ps}, y, t),
        lambda x, y: ratio.apply(rv, x, y, method=ratio.log_ratio),
        jax.random.PRNGKey(7), MC_BATCH, (32, 32, 1), (32, 32, 3), NUM_STEPS)
    _sync((mc[0],))
    for w in range(2):
        _sync(sampler_p(params_p, jax.random.PRNGKey(1 + w), HEADLINE_B, mc))
    t0 = time.perf_counter()
    out = sampler_p(params_p, jax.random.PRNGKey(9), HEADLINE_B, mc)
    _sync(out)
    t_main = time.perf_counter() - t0
    t_full = best_t
    details["phase_split_B512_sec"] = {
        "full_pipeline": round(t_full, 4),
        "main_ode_with_warm_mc_set": round(t_main, 4),
        "mc_phase_A_implied": round(t_full - t_main, 4),
    }
    details["serving_steady_state_samples_per_sec"] = round(
        HEADLINE_B / t_main, 1)

    # Train-step throughput (BASELINE.json: "FM+ratio train steps/sec"),
    # B=128 like the reference's training defaults.
    from ratio_guided_multimodal_fm_tpu.train.steps import (
        create_fm_state,
        create_ratio_state,
        make_fm_train_step,
        make_ratio_train_step,
    )

    def _train_rate(step_fn, state, args_fn, reps: int = 20):
        st = state
        for w in range(3):  # compile + warm
            st, aux = step_fn(st, *args_fn(w))
            _sync((aux["loss"][None] if isinstance(aux, dict)
                   else jnp.asarray(aux)[None],))
        t0 = time.perf_counter()
        for i in range(reps):
            st, aux = step_fn(st, *args_fn(3 + i))
        _sync((aux["loss"][None] if isinstance(aux, dict)
               else jnp.asarray(aux)[None],))
        return reps / (time.perf_counter() - t0)

    kb = jax.random.PRNGKey(11)
    fm_state = create_fm_state(fm_s, jax.random.PRNGKey(12), (32, 32, 3),
                               lr=1e-4)
    fm_step = make_fm_train_step(fm_s)
    xb = jax.random.normal(kb, (128, 32, 32, 3), jnp.float32)
    details["train_steps_per_sec"] = {
        "fm_svhn_B128": round(_train_rate(
            fm_step, fm_state,
            lambda i: (xb, jax.random.PRNGKey(100 + i))), 1),
    }
    # Train-step MFU from analytic FLOPs (fwd + ~2x for backward; the
    # cost_analysis route under-counts — see _flops_of docstring).
    from ratio_guided_multimodal_fm_tpu.core.flops import svhn_unet_flops

    rate = details["train_steps_per_sec"]["fm_svhn_B128"]
    details["train_fm_mfu_pct"] = round(
        100.0 * 3.0 * svhn_unet_flops(128) * rate / PEAK_FLOPS_BF16, 2)

    # --fast_rng (rbg keys): dropout's threefry masks cost 2.2 ms of the
    # 5.4 ms fwd AND are rematerialized in the backward (grad 14.7 ->
    # 10.0 ms measured, docs/results_r5/profile_train_variants.json);
    # the same step with RngBitGenerator keys is the shipped fix.
    rate_rbg = _train_rate(
        fm_step, create_fm_state(fm_s, jax.random.PRNGKey(12),
                                 (32, 32, 3), lr=1e-4),
        lambda i: (xb, jax.random.key(100 + i, impl="rbg")))
    details["train_steps_per_sec"]["fm_svhn_B128_fast_rng"] = round(
        rate_rbg, 1)
    details["train_fm_mfu_fast_rng_pct"] = round(
        100.0 * 3.0 * svhn_unet_flops(128) * rate_rbg / PEAK_FLOPS_BF16, 2)

    # Fused K-step dispatch (train/steps.py:make_fm_train_multistep):
    # K optimizer steps per XLA program over a device-resident dataset.
    # The rate-vs-K curve IS the dispatch-floor quantification the r4
    # verdict asked for: the K=1 -> K=big gap is pure per-dispatch
    # latency (tunnel RTT + host overhead); the saturated rate is the
    # compute+input floor. Steps/s here counts OPTIMIZER steps (K x
    # macro dispatches) at identical per-step math.
    from ratio_guided_multimodal_fm_tpu.train.steps import (
        make_fm_train_multistep,
    )

    ds_train = jax.random.normal(kb, (4096, 32, 32, 3), jnp.float32)
    fused_rates = {}
    for K in (4, 16, 32):
        fstep = make_fm_train_multistep(fm_s)
        fstate = create_fm_state(fm_s, jax.random.PRNGKey(12), (32, 32, 3),
                                 lr=1e-4)
        def _idx(i, _k=K):
            return jax.random.randint(jax.random.PRNGKey(1000 + 37 * i + _k),
                                      (_k, 128), 0, 4096, jnp.int32)

        macro_reps = max(1, 64 // K)
        st = fstate
        for w in range(2):   # compile + warm
            st, loss = fstep(st, ds_train, _idx(w), jax.random.PRNGKey(w))
            _sync((loss[None],))
        t0 = time.perf_counter()
        for i in range(macro_reps):
            st, loss = fstep(st, ds_train, _idx(2 + i),
                             jax.random.PRNGKey(2 + i))
        _sync((loss[None],))
        fused_rates[f"K={K}"] = round(
            K * macro_reps / (time.perf_counter() - t0), 1)
    details["train_steps_per_sec"]["fm_svhn_B128_fused"] = fused_rates
    # fused + fast_rng composed: the K-step scan pipelines the (now
    # cheap) rbg mask generation across iterations — the chain_grad
    # regime of profile_train_variants.json (10.0 ms/step grad).
    fstep = make_fm_train_multistep(fm_s)
    st = create_fm_state(fm_s, jax.random.PRNGKey(12), (32, 32, 3),
                         lr=1e-4)
    for w in range(2):
        st, loss = fstep(st, ds_train, _idx(w, 16),
                         jax.random.key(w, impl="rbg"))
        _sync((loss[None],))
    t0 = time.perf_counter()
    for i in range(4):
        st, loss = fstep(st, ds_train, _idx(2 + i, 16),
                         jax.random.key(2 + i, impl="rbg"))
    _sync((loss[None],))
    rate_ffr = 64.0 / (time.perf_counter() - t0)
    details["train_steps_per_sec"]["fm_svhn_B128_fused16_fast_rng"] = (
        round(rate_ffr, 1))
    details["train_fm_mfu_fused_fast_rng_pct"] = round(
        100.0 * 3.0 * svhn_unet_flops(128) * rate_ffr / PEAK_FLOPS_BF16, 2)
    best_fused = max(fused_rates.values())
    details["train_fm_mfu_fused_pct"] = round(
        100.0 * 3.0 * svhn_unet_flops(128) * best_fused / PEAK_FLOPS_BF16, 2)
    details["train_dispatch_floor_ms"] = round(
        1e3 * (1.0 / rate - 1.0 / best_fused), 2) if best_fused > rate else 0.0
    ratio_state = create_ratio_state(ratio, jax.random.PRNGKey(13),
                                     (32, 32, 1), (32, 32, 3), lr=1e-4,
                                     has_batch_stats=True)
    ratio_step = make_ratio_train_step(ratio, "disc",
                                   has_batch_stats=True)
    xr = jax.random.normal(kb, (128, 32, 32, 1), jnp.float32)
    yr = jax.random.normal(kb, (128, 32, 32, 3), jnp.float32)
    ir = (jnp.arange(128) % 2).astype(jnp.float32)
    details["train_steps_per_sec"]["ratio_mnist_svhn_B128"] = round(
        _train_rate(ratio_step, ratio_state,
                    lambda i: (xr, yr, ir, jax.random.PRNGKey(200 + i))), 1)

    # Fused ratio trainer (make_ratio_train_multistep), same K-sweep
    # rationale as the FM fused block above.
    from ratio_guided_multimodal_fm_tpu.train.steps import (
        make_ratio_train_multistep,
    )

    xr_all = jax.random.normal(kb, (4096, 32, 32, 1), jnp.float32)
    yr_all = jax.random.normal(kb, (4096, 32, 32, 3), jnp.float32)
    fused_ratio = {}
    for K in (4, 16):
        rstep = make_ratio_train_multistep(ratio, "disc",
                                           has_batch_stats=True)
        rstate = create_ratio_state(ratio, jax.random.PRNGKey(13),
                                    (32, 32, 1), (32, 32, 3), lr=1e-4,
                                    has_batch_stats=True)

        def _ridx(i, _k=K):
            k1 = jax.random.PRNGKey(3000 + 37 * i + _k)
            xi = jax.random.randint(k1, (_k, 128), 0, 4096, jnp.int32)
            yi = jax.random.randint(jax.random.fold_in(k1, 1),
                                    (_k, 128), 0, 4096, jnp.int32)
            irm = (jax.random.uniform(jax.random.fold_in(k1, 2),
                                      (_k, 128)) < 0.5).astype(jnp.float32)
            return xi, yi, irm

        macro_reps = max(1, 64 // K)
        st = rstate
        for w in range(2):
            xi, yi, irm = _ridx(w)
            st, m = rstep(st, xr_all, yr_all, xi, yi, irm,
                          jax.random.PRNGKey(w))
            _sync((m["loss"][None],))
        t0 = time.perf_counter()
        for i in range(macro_reps):
            xi, yi, irm = _ridx(2 + i)
            st, m = rstep(st, xr_all, yr_all, xi, yi, irm,
                          jax.random.PRNGKey(2 + i))
        _sync((m["loss"][None],))
        fused_ratio[f"K={K}"] = round(
            K * macro_reps / (time.perf_counter() - t0), 1)
    details["train_steps_per_sec"]["ratio_mnist_svhn_B128_fused"] = (
        fused_ratio)
    if os.path.exists(BASELINE_FILE):
        with open(BASELINE_FILE) as f:
            bl = json.load(f)
        fm_ref = bl.get("reference_cpu_fm_svhn_train_steps_per_sec_B128")
        r_ref = bl.get("reference_cpu_ratio_train_steps_per_sec_B128")
        if fm_ref:
            details["train_vs_reference_cpu"] = {
                "fm_svhn": round(
                    details["train_steps_per_sec"]["fm_svhn_B128"] / fm_ref,
                    1),
                "ratio_mnist_svhn": round(
                    details["train_steps_per_sec"]["ratio_mnist_svhn_B128"]
                    / r_ref, 1) if r_ref else None,
            }

    headline = sweep[f"B={HEADLINE_B}"]
    details["headline"] = {
        "metric": f"guided pair samples/sec/chip (100 ODE steps, N_mc=256, "
                  f"MNIST-SVHN, B={HEADLINE_B})",
        "value": headline,
        "mfu_pct": mfu.get(f"B={HEADLINE_B}"),
    }
    fp = fast_operating_point()
    if fp:
        details["fast_operating_point"] = fp
    details["date"] = time.strftime("%Y-%m-%d")
    with open(DETAILS_FILE, "w") as f:
        json.dump(details, f, indent=2)
        f.write("\n")
    return details


def measure_reference_train_baseline() -> dict:
    """Time the reference's FM/ratio TRAIN steps on torch CPU at B=128
    (the reference's own batch default) — the missing comparison point for
    train_steps_per_sec (VERDICT r2 §weak-8). Random data: step cost is
    weight/data-independent."""
    sys.path.insert(0, "/root/reference")
    import torch

    from src.models.ratio_flexible import RatioEstimatorMNISTSVHN as TRatio
    from src.models.unet_flexible import FlowMatchingUNetSVHN as TFMS
    from src.utils.losses import get_ratio_loss

    torch.manual_seed(0)
    out = {}
    fm = TFMS()
    opt = torch.optim.Adam(fm.parameters(), lr=1e-4)
    x1 = torch.randn(128, 3, 32, 32)
    # inline CFM step matching ref train_flow_svhn.py:58-97
    def fm_step():
        t = torch.rand(128)
        x0 = torch.randn_like(x1)
        tb = t.view(-1, 1, 1, 1)
        x_t = (1 - tb) * x0 + tb * x1
        v = fm(x_t, t)
        loss = torch.nn.functional.mse_loss(v, x1 - x0)
        opt.zero_grad(); loss.backward(); opt.step()
    for _ in range(2):
        fm_step()
    t0 = time.perf_counter()
    for _ in range(5):
        fm_step()
    out["reference_cpu_fm_svhn_train_steps_per_sec_B128"] = round(
        5 / (time.perf_counter() - t0), 2)

    ratio = TRatio()
    ropt = torch.optim.Adam(ratio.parameters(), lr=1e-4)
    loss_fn = get_ratio_loss("disc")
    xm = torch.randn(128, 1, 32, 32)
    ys = torch.randn(128, 3, 32, 32)
    is_real = torch.randint(0, 2, (128,)).bool()
    def ratio_step():
        scores = ratio(xm, ys)
        loss, _ = loss_fn(scores[is_real], scores[~is_real])
        ropt.zero_grad(); loss.backward(); ropt.step()
    for _ in range(2):
        ratio_step()
    t0 = time.perf_counter()
    for _ in range(5):
        ratio_step()
    out["reference_cpu_ratio_train_steps_per_sec_B128"] = round(
        5 / (time.perf_counter() - t0), 2)
    return out


def measure_reference_baseline() -> float:
    """Time the reference's sampler on torch CPU (scaled-down: 10x fewer
    steps and B=64; cost is linear in both, so samples/sec transfers)."""
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

    # Separate the fixed MC phase-A cost (independent of B) from the
    # per-sample phase-B cost, so the baseline extrapolates honestly to the
    # headline batch: t(B) = tA + tB_per64*(B/64), all linear in num_steps.
    n, steps_scaled = 64, 10
    t0 = time.perf_counter()
    sample_bimodal_guided_mnist_svhn(
        fm_mnist=fm_m, fm_svhn=fm_s, ratio_estimator=None,
        guidance_method="none", guidance_strength=0.0,
        num_samples=n, num_steps=steps_scaled, device="cpu",
        mc_batch_size=MC_BATCH)
    t_none = time.perf_counter() - t0
    t0 = time.perf_counter()
    sample_bimodal_guided_mnist_svhn(
        fm_mnist=fm_m, fm_svhn=fm_s, ratio_estimator=ratio,
        guidance_method="mc_feng", guidance_strength=0.5,
        num_samples=n, num_steps=steps_scaled, device="cpu",
        mc_batch_size=MC_BATCH)
    t_mc = time.perf_counter() - t0
    scale = NUM_STEPS / steps_scaled
    t_phase_a = max(t_mc - t_none, 0.0) * scale
    t_phase_b_per64 = t_none * scale
    def thr(B):
        return B / (t_phase_a + t_phase_b_per64 * (B / 64))
    return {f"B={b}": thr(b) for b in SWEEP_B}


def main():
    if "--measure-baseline" in sys.argv:
        thr = measure_reference_baseline()
        train = measure_reference_train_baseline()
        with open(BASELINE_FILE, "w") as f:
            json.dump({
                "reference_cpu_samples_per_sec": thr[f"B={HEADLINE_B}"],
                "reference_cpu_samples_per_sec_by_batch": thr,
                **train,
                "workload": {"num_steps": NUM_STEPS,
                             "mc_batch_size": MC_BATCH,
                             "headline_batch": HEADLINE_B,
                             "note": "phase A (fixed) and phase B (linear "
                                     "in B) measured separately, both "
                                     "linear in num_steps"},
            }, f, indent=2)
            f.write("\n")
        print(f"reference CPU baseline: {thr} {train} -> {BASELINE_FILE}")
        return

    details = run_tpu_bench()
    value = details["headline"]["value"]
    baseline = None
    if os.path.exists(BASELINE_FILE):
        with open(BASELINE_FILE) as f:
            baseline = json.load(f)["reference_cpu_samples_per_sec"]
    vs = (value / baseline) if baseline else None
    print(json.dumps({
        "metric": details["headline"]["metric"],
        "value": round(value, 3),
        "unit": "samples/sec/chip",
        "vs_baseline": round(vs, 2) if vs is not None else None,
        "mfu_pct": details["headline"]["mfu_pct"],
    }))


if __name__ == "__main__":
    main()
