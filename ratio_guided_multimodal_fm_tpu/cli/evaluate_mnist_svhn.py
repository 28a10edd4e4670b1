"""Evaluate MNIST-SVHN guided sampling: dual-classifier coherence (+FID).

Flag-parity with ref src/evaluate_mnist_svhn.py:60-77; JSON to
outputs/mnist_svhn/evaluation_results.json.
"""
from __future__ import annotations

import argparse
import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from ratio_guided_multimodal_fm_tpu.cli.common import (
    add_common_flags,
    add_reflow_flag,
    add_solver_flag,
    load_params_or_exit,
    velocity_fn,
)
from ratio_guided_multimodal_fm_tpu.cli.sample_mnist_svhn import (
    load_mnist_svhn_models,
)
from ratio_guided_multimodal_fm_tpu.core.prng import set_seed
from ratio_guided_multimodal_fm_tpu.data.mnist_svhn import (
    get_mnist32_flow_dataloader,
    get_svhn_flow_dataloader,
)
from ratio_guided_multimodal_fm_tpu.eval.chunked import (
    DEFAULT_AUTO_CHUNKS,
    sample_in_chunks,
)
from ratio_guided_multimodal_fm_tpu.eval.coherence import evaluate_coherence_dual
from ratio_guided_multimodal_fm_tpu.eval.fid import compute_fid
from ratio_guided_multimodal_fm_tpu.models import MNISTClassifier32, SVHNClassifier
from ratio_guided_multimodal_fm_tpu.sample import (
    GuidedSamplerConfig,
    generate_mc_set,
    make_guided_sampler,
)
from ratio_guided_multimodal_fm_tpu.train.checkpoint import (
    checkpoint_exists,
    load_checkpoint,
)


def main(argv=None):
    parser = argparse.ArgumentParser(description="Evaluate MNIST-SVHN sampling")
    parser.add_argument("--guidance_methods", nargs="+",
                        default=["none", "mc_feng"],
                        help="any of: none, mc_feng, grad, mc_feng+grad, "
                             "smc (particle-filter guidance, sample/smc.py)")
    parser.add_argument("--guidance_strengths", nargs="+", type=float,
                        default=[0.0, 0.5, 1.0])
    parser.add_argument("--mc_batch_size", type=int, default=256)
    parser.add_argument("--loss_type", type=str, default="disc")
    parser.add_argument("--num_samples", type=int, default=500)
    parser.add_argument("--num_steps", type=int, default=100)
    add_solver_flag(parser)
    add_reflow_flag(parser)
    from ratio_guided_multimodal_fm_tpu.cli.common import (add_ema_flag,
                                                           add_smc_flags)
    add_ema_flag(parser)
    add_smc_flags(parser)
    # Exp-2 SMC knee differs from exp-1's: the BatchNorm ratio net's
    # per-pair signal is noisier, and smaller islands + harder selection
    # recover it — 0.705/0.736 at γ=2/5 vs 0.621/0.697 at the exp-1
    # defaults (ROUND5.md §3, exp2_smc_g8tau07.json).
    parser.set_defaults(smc_group=8, smc_resample_tau=0.7)
    parser.add_argument("--ratio_clip", type=float, default=None,
                        help="Clip |log ratio| of MC samples")
    parser.add_argument("--grad_strength", type=float, default=None,
                        help="Separate strength for the grad term "
                             "(default: guidance_strength)")
    parser.add_argument("--grad_scale", type=str, default="const",
                        choices=["const", "sigma"],
                        help="grad term scaling: const or sigma_t^2")
    parser.add_argument("--grad_t_max", type=float, default=1.0,
                        help="gate the grad term to t < grad_t_max")
    parser.add_argument("--ess_floor", type=float, default=None,
                        help="Adaptive guidance: per-trajectory gamma_eff = "
                             "gamma*min(1, ESS/ess_floor)")
    parser.add_argument("--mc_refresh", type=int, default=1,
                        help="ABLATION ONLY — measured harmful (coherence "
                             "0.824 -> 0.363/0.213 at K=2/4 on exp-1; "
                             "ROUND5.md §2). Fresh MC candidate sets per "
                             "trajectory (mc_feng only, see cli/evaluate"
                             ".py). 1 = reference protocol (keep it).")
    parser.add_argument("--eval_chunks", type=str, default="auto",
                        help="'auto' (default): chunked sampling with a "
                             "fresh MC set per chunk (see cli/evaluate.py);"
                             " an integer forces that many chunks (1 = "
                             "round-2 single-shared-set protocol)")
    parser.add_argument("--auto_chunks", type=int,
                        default=DEFAULT_AUTO_CHUNKS,
                        help="Number of chunks in 'auto' mode (default 4)")
    parser.add_argument("--inception_weights", type=str, default=None,
                        help="Path to an Inception network (TorchScript or "
                             "torchvision inception_v3 .pth) for TRUE "
                             "Inception-FID; without it --fid reports the "
                             "clearly-labeled classifier-feature Frechet "
                             "distance (eval/fid.py)")
    parser.add_argument("--fid", action="store_true",
                        help="Also compute classifier-FID vs real data")
    add_common_flags(parser)
    args = parser.parse_args(argv)

    from ratio_guided_multimodal_fm_tpu.cli.common import init_runtime
    init_runtime(args)   # --device cpu override + multi-host init

    key = set_seed(args.seed)
    print(f"Random seed: {args.seed}")

    # classifiers
    clf_m = MNISTClassifier32()
    init_m = clf_m.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 1)))
    params_clf_m = load_params_or_exit(
        "checkpoints/mnist32_classifier", init_m["params"],
        "MNIST32 classifier",
        "Train first: python -m "
        "ratio_guided_multimodal_fm_tpu.cli.train_classifiers_mnist_svhn")
    clf_s = SVHNClassifier()
    path_s = "checkpoints/svhn_classifier"
    if not checkpoint_exists(path_s):
        raise SystemExit(f"ERROR: SVHN classifier not found: {path_s}")
    tree_s = load_checkpoint(path_s)
    vars_s = {"params": tree_s["params"]}
    if "batch_stats" in tree_s:
        vars_s["batch_stats"] = tree_s["batch_stats"]

    classify_m = jax.jit(lambda x: clf_m.apply({"params": params_clf_m}, x))
    classify_s = jax.jit(lambda y: clf_s.apply(vars_s, y, deterministic=True))

    from ratio_guided_multimodal_fm_tpu.cli.common import dtype_of
    need_ratio = any(m != "none" for m in args.guidance_methods)
    fm_m, params_m, fm_s, params_s, log_ratio = load_mnist_svhn_models(
        args.loss_type, need_ratio, dtype=dtype_of(args),
        reflow=args.reflow, ema=args.ema, ratio_ema=args.ratio_ema)

    real_m = real_s = None
    if args.fid:
        n = min(args.num_samples, 1000)
        real_m = next(iter(get_mnist32_flow_dataloader(n, False,
                                                       args.data_root)))["x"]
        real_s = next(iter(get_svhn_flow_dataloader(n, False,
                                                    args.data_root)))["x"]

    results = []
    mc_cache = {}
    # Stable velocity closures (created once): jit caches keyed on them —
    # euler_sample's static velocity_fn, the per-config sampler — hit
    # across chunks instead of re-tracing the fused scan per chunk.
    v_m = velocity_fn(fm_m, params_m)
    v_s = velocity_fn(fm_s, params_s)
    for method in args.guidance_methods:
        for strength in args.guidance_strengths:
            if method == "none" and strength > 0:
                continue
            print(f"\n{'='*60}\nEvaluating: method={method}, "
                  f"gamma={strength}\n{'='*60}")
            # MC sets are strength-independent: one cache per method
            # reused across the gamma sweep; default policy = fresh set
            # per chunk (see cli/evaluate.py and eval/chunked.py).
            make_mc = None
            if (method in ("mc_feng", "mc_feng+grad")
                    and args.mc_refresh <= 1):
                def make_mc(k, _lr=log_ratio):
                    return generate_mc_set(
                        v_m, v_s, _lr, k,
                        args.mc_batch_size, (32, 32, 1), (32, 32, 3),
                        args.num_steps, log_ratio_clip=args.ratio_clip,
                        solver=args.solver, time_grid=args.time_grid,
                        grid_power=args.grid_power)

            # ONE jitted sampler per (method, strength), reused by every
            # chunk — not a fresh trace per chunk.
            if method == "smc":
                from ratio_guided_multimodal_fm_tpu.cli.common import (
                    smc_config_from_args)
                from ratio_guided_multimodal_fm_tpu.sample import (
                    make_smc_sampler)

                smc_cfg = smc_config_from_args(args, strength,
                                               (32, 32, 1), (32, 32, 3))
                smc_sampler = jax.jit(
                    make_smc_sampler(v_m, v_s, smc_cfg, log_ratio),
                    static_argnums=(1,))

                def sample_chunk(ck, n_i, mc_ci, _s=smc_sampler):
                    return _s(ck, n_i)
            else:
                cfg = GuidedSamplerConfig(
                    guidance_method=method, guidance_strength=strength,
                    num_steps=args.num_steps,
                    mc_batch_size=args.mc_batch_size,
                    x_shape=(32, 32, 1), y_shape=(32, 32, 3),
                    ess_floor=args.ess_floor,
                    grad_strength=args.grad_strength,
                    grad_scale=args.grad_scale, grad_t_max=args.grad_t_max,
                    solver=args.solver, time_grid=args.time_grid,
                    grid_power=args.grid_power,
                    mc_refresh=args.mc_refresh)
                sampler = jax.jit(
                    make_guided_sampler(
                        v_m, v_s, cfg,
                        log_ratio if method != "none" else None),
                    static_argnums=(1,))

                def sample_chunk(ck, n_i, mc_ci, _s=sampler):
                    return _s(ck, n_i, mc_ci)

            print(f"  Sampling {args.num_samples} pairs...")
            no_mc = ("mc_refresh>1: fresh candidate sets generated inside "
                     "the fused sampler (refresh subsumes per-chunk sets)"
                     if (args.mc_refresh > 1
                         and method in ("mc_feng", "mc_feng+grad"))
                     else "no MC set (method has no candidate pool)")
            samples_x, samples_y, merged_diags, chunk_info = sample_in_chunks(
                sample_chunk, make_mc, args.num_samples, key,
                eval_chunks=args.eval_chunks,
                auto_chunks=args.auto_chunks,
                mc_cache=mc_cache.setdefault(method, {}),
                no_mc_reason=no_mc)
            from ratio_guided_multimodal_fm_tpu.cli.common import (
                report_guidance_diagnostics,
            )
            report_guidance_diagnostics(merged_diags, args.num_steps,
                                        time_grid=args.time_grid,
                                        grid_power=args.grid_power)

            metrics = evaluate_coherence_dual(samples_x, samples_y,
                                              classify_m, classify_s)
            result = {
                "method": method,
                "guidance_strength": strength,
                "coherence_acc": metrics["coherence_acc"],
                "num_samples": metrics["num_samples"],
                "label_entropy_x": metrics["label_entropy_x"],
                "label_entropy_y": metrics["label_entropy_y"],
            }
            for k in ("n_chunks", "chunk_policy", "mc_set_ess",
                      "ess_final_mean", "ess_final_min",
                      "ess_trajectory_min", "ess_trajectory_mean"):
                if k in chunk_info:
                    result[k] = chunk_info[k]
            if args.mc_refresh > 1 and method in ("mc_feng",
                                                  "mc_feng+grad"):
                result["mc_refresh"] = args.mc_refresh
            if method == "smc":
                result["smc_final_ess"] = float(
                    np.mean(merged_diags["final_ess"]))
                # Event count (global mode) / island-average event count
                # (island mode) — see cli/evaluate.py.
                result["smc_resamples"] = float(
                    np.sum(merged_diags["resampled"]))
                result["smc_churn"] = args.smc_churn
                result["smc_resample_tau"] = args.smc_resample_tau
            if args.fid:
                # classifier-feature Frechet distance, not Inception-FID
                result["classifier_fid_mnist"] = compute_fid(
                    clf_m, {"params": params_clf_m}, real_m,
                    np.asarray(samples_x))
                if args.inception_weights:
                    from ratio_guided_multimodal_fm_tpu.eval.fid import (
                        compute_inception_fid,
                    )
                    result["inception_fid_mnist"] = compute_inception_fid(
                        np.asarray(real_m), np.asarray(samples_x),
                        args.inception_weights)
            results.append(result)
            print(f"  -> Coherence accuracy: {metrics['coherence_acc']:.3f}")

    os.makedirs("outputs/mnist_svhn", exist_ok=True)
    output_path = "outputs/mnist_svhn/evaluation_results.json"
    with open(output_path, "w") as f:
        json.dump(results, f, indent=2)
    print(f"\nResults saved to: {output_path}")

    print("\nSummary:")
    for r in results:
        print(f"  {r['method']:20s} gamma={r['guidance_strength']:.1f} "
              f"-> coherence={r['coherence_acc']:.3f}")


if __name__ == "__main__":
    main()
