"""Evaluate coherence of generated pairs over (method × strength) sweep.

Flag-parity with ref src/evaluate.py:93-116; adds FID (BASELINE.json target)
and the 'grad' method. JSON output path matches:
outputs/evaluation_results.json.
"""
from __future__ import annotations

import argparse
import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from ratio_guided_multimodal_fm_tpu.cli.common import (
    dtype_of,
    add_common_flags,
    add_reflow_flag,
    add_solver_flag,
    fm_model,
    load_params_or_exit,
    maybe_merged_pair_fn,
    ratio_log_fn,
    report_guidance_diagnostics,
    velocity_fn,
)
from ratio_guided_multimodal_fm_tpu.core.prng import set_seed
from ratio_guided_multimodal_fm_tpu.data.mnist_dataset import get_classifier_dataloader
from ratio_guided_multimodal_fm_tpu.eval.chunked import (
    DEFAULT_AUTO_CHUNKS,
    sample_in_chunks,
)
from ratio_guided_multimodal_fm_tpu.eval.coherence import evaluate_coherence
from ratio_guided_multimodal_fm_tpu.eval.fid import compute_fid
from ratio_guided_multimodal_fm_tpu.models import MNISTClassifier, RatioEstimatorMNIST
from ratio_guided_multimodal_fm_tpu.sample import (
    GuidedSamplerConfig,
    generate_mc_set,
    make_guided_sampler,
)
from ratio_guided_multimodal_fm_tpu.train.checkpoint import get_checkpoint_path


def main(argv=None):
    parser = argparse.ArgumentParser(description="Evaluate guided sampling")
    parser.add_argument("--transform_type", type=str, default="rotate90")
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
    from ratio_guided_multimodal_fm_tpu.cli.common import add_ema_flag
    add_ema_flag(parser)
    from ratio_guided_multimodal_fm_tpu.cli.common import add_smc_flags
    add_smc_flags(parser)
    parser.add_argument("--model", type=str, default="unet",
                        choices=["unet", "original"])
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
                        help="ABLATION ONLY — measured harmful. K>1 "
                             "regenerates the N_mc set every num_steps/K "
                             "ODE steps INSIDE the fused sampler; the "
                             "mid-flight re-rank destroys coherence "
                             "(0.824 -> 0.363/0.213 at K=2/4, FID 218 -> "
                             "452/641; docs/results_r4/mc_refresh*_eval"
                             ".json, ROUND5.md §2). With K>1 the chunk "
                             "policy drops to 1 chunk. 1 = reference "
                             "protocol (keep it).")
    parser.add_argument("--eval_chunks", type=str, default="auto",
                        help="'auto' (default): chunked sampling with a "
                             "FRESH MC set per chunk — candidates-per-"
                             "trajectory controls guided quality and this "
                             "matches the reference protocol, which "
                             "regenerates its MC set every call "
                             "(eval/chunked.py). An integer forces that "
                             "many chunks (1 = round-2 single-shared-set "
                             "protocol).")
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
    parser.add_argument("--save_samples", action="store_true",
                        help="Save generated samples per config as "
                             "outputs/samples_{method}_gamma{g}_{transform}"
                             ".npz (for cross-implementation evaluation)")
    add_common_flags(parser)
    args = parser.parse_args(argv)

    from ratio_guided_multimodal_fm_tpu.cli.common import init_runtime
    init_runtime(args)   # --device cpu override + multi-host init

    key = set_seed(args.seed)
    print(f"Random seed: {args.seed}")

    # Eval classifier
    clf = MNISTClassifier()
    clf_init = clf.init(jax.random.PRNGKey(0), jnp.zeros((1, 28, 28, 1)))
    clf_params = load_params_or_exit(
        os.path.join("checkpoints", "mnist_classifier"),
        clf_init["params"], "Classifier",
        "Please train classifier first: python -m "
        "ratio_guided_multimodal_fm_tpu.cli.train_classifier")
    classify = jax.jit(lambda x: clf.apply({"params": clf_params}, x))

    model = fm_model(args.model, dtype=dtype_of(args))
    init = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 28, 28, 1)),
                      jnp.zeros((1,)))
    rf = "reflow" if args.reflow else None
    em = "ema" if getattr(args, "ema", False) else None
    path_x = get_checkpoint_path("flow", "x", None, rf, em, "best")
    path_y = get_checkpoint_path("flow", "y", args.transform_type, rf, em,
                                 "best")
    params_x = load_params_or_exit(path_x, init["params"], "FM_x", "")
    params_y = load_params_or_exit(path_y, init["params"], "FM_y", "")
    fm_pair = maybe_merged_pair_fn(model, model, params_x, params_y, args)
    print("  Loaded FM_x and FM_y"
          + (" (merged-pair evaluation)" if fm_pair is not None else ""))

    real_images = None
    if args.fid:
        loader = get_classifier_dataloader(batch_size=args.num_samples,
                                           train=False, root=args.data_root)
        real_images = next(iter(loader))["x"]

    results = []
    mc_cache = {}
    # Stable velocity closures: created ONCE so the jit caches keyed on
    # them (euler_sample's static velocity_fn, the per-config sampler)
    # hit across chunks and configs instead of re-tracing the fused
    # 100-step scan per chunk — on this backend a re-trace routes through
    # the slow remote compile helper.
    fm_x = velocity_fn(model, params_x)
    fm_y = velocity_fn(model, params_y)
    for method in args.guidance_methods:
        for strength in args.guidance_strengths:
            if method == "none" and strength > 0:
                continue
            print(f"\n{'='*60}\nEvaluating: method={method}, gamma={strength}\n{'='*60}")

            log_ratio = None
            if method != "none":
                ratio = RatioEstimatorMNIST(loss_type=args.loss_type)
                r_init = ratio.init(jax.random.PRNGKey(0),
                                    jnp.zeros((1, 28, 28, 1)),
                                    jnp.zeros((1, 28, 28, 1)))
                rem = "ema" if getattr(args, "ratio_ema", False) else None
                path_r = get_checkpoint_path("ratio", args.loss_type,
                                             args.transform_type, rem,
                                             "best")
                try:
                    r_params = load_params_or_exit(path_r, r_init["params"],
                                                   "Ratio estimator", "")
                except SystemExit:
                    print(f"ERROR: Ratio estimator not found: {path_r}")
                    continue
                log_ratio = ratio_log_fn(ratio, {"params": r_params})

            # MC sets are strength-independent: one cache per method reused
            # across the gamma sweep (saves ~70% per config) — including
            # the per-chunk fresh sets (default policy: fresh set per
            # chunk, eval/chunked.py).
            make_mc = None
            if (method in ("mc_feng", "mc_feng+grad")
                    and args.mc_refresh <= 1):
                def make_mc(k, _lr=log_ratio):
                    return generate_mc_set(
                        fm_x, fm_y, _lr, k,
                        args.mc_batch_size, (28, 28, 1), (28, 28, 1),
                        args.num_steps, log_ratio_clip=args.ratio_clip,
                        fm_pair_fn=fm_pair, solver=args.solver,
                        time_grid=args.time_grid,
                        grid_power=args.grid_power)

            # ONE jitted sampler per (method, strength), reused by every
            # chunk (identical shapes at the default equal-split) — not a
            # fresh trace per chunk.
            if method == "smc":
                from ratio_guided_multimodal_fm_tpu.cli.common import (
                    smc_config_from_args)
                from ratio_guided_multimodal_fm_tpu.sample import (
                    make_smc_sampler)

                smc_cfg = smc_config_from_args(args, strength,
                                               (28, 28, 1), (28, 28, 1))
                smc_sampler = jax.jit(
                    make_smc_sampler(fm_x, fm_y, smc_cfg, log_ratio),
                    static_argnums=(1,))

                def sample_chunk(ck, n_i, mc_ci, _s=smc_sampler):
                    return _s(ck, n_i)
            else:
                cfg = GuidedSamplerConfig(
                    guidance_method=method, guidance_strength=strength,
                    num_steps=args.num_steps,
                    mc_batch_size=args.mc_batch_size,
                    x_shape=(28, 28, 1), y_shape=(28, 28, 1),
                    ess_floor=args.ess_floor,
                    grad_strength=args.grad_strength,
                    grad_scale=args.grad_scale, grad_t_max=args.grad_t_max,
                    solver=args.solver, time_grid=args.time_grid,
                    grid_power=args.grid_power,
                    mc_refresh=args.mc_refresh)
                sampler = jax.jit(
                    make_guided_sampler(fm_x, fm_y, cfg, log_ratio,
                                        fm_pair_fn=fm_pair),
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
            report_guidance_diagnostics(merged_diags, args.num_steps,
                                        time_grid=args.time_grid,
                                        grid_power=args.grid_power)

            metrics = evaluate_coherence(samples_x, samples_y, classify,
                                         args.transform_type)
            result = {
                "method": method,
                "guidance_strength": strength,
                "transform_type": args.transform_type,
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
                # Sum over steps of the per-step 'resampled' value: an
                # event COUNT in global mode, the island-average event
                # count in island mode (each step contributes the
                # fraction of islands that resampled).
                result["smc_resamples"] = float(
                    np.sum(merged_diags["resampled"]))
                result["smc_churn"] = args.smc_churn
                result["smc_resample_tau"] = args.smc_resample_tau
            if args.fid and real_images is not None:
                # "classifier_fid": Frechet distance on eval-classifier
                # features, NOT Inception-FID (eval/fid.py docstring).
                result["classifier_fid_x"] = compute_fid(
                    clf, {"params": clf_params}, real_images,
                    np.asarray(samples_x))
                if args.inception_weights:
                    from ratio_guided_multimodal_fm_tpu.eval.fid import (
                        compute_inception_fid,
                    )
                    result["inception_fid_x"] = compute_inception_fid(
                        np.asarray(real_images), np.asarray(samples_x),
                        args.inception_weights)
            if args.save_samples:
                os.makedirs("outputs", exist_ok=True)
                np.savez_compressed(
                    f"outputs/samples_{method}_gamma{strength}"
                    f"_{args.transform_type}.npz",
                    x=np.asarray(samples_x), y=np.asarray(samples_y))
            results.append(result)
            print(f"  -> Coherence accuracy: {metrics['coherence_acc']:.3f}")

    os.makedirs("outputs", exist_ok=True)
    output_path = "outputs/evaluation_results.json"
    with open(output_path, "w") as f:
        json.dump(results, f, indent=2)
    print(f"\n{'='*60}\nResults saved to: {output_path}\n{'='*60}")

    print("\nSummary:")
    for r in results:
        print(f"  {r['method']:20s} gamma={r['guidance_strength']:.1f} "
              f"-> coherence={r['coherence_acc']:.3f}")


if __name__ == "__main__":
    main()
