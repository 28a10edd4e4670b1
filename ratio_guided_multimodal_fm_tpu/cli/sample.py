"""Generate (x, y) pairs via guided sampling (MNIST transforms).

Flag-parity with ref src/sample.py:113-137 plus the 'grad' guidance method
the reference README documents but never wired (README.md:159-164).
Output PNG path matches: outputs/samples_{method}_gamma{γ}_{transform}.png.
"""
from __future__ import annotations

import argparse
import os

import jax

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
from ratio_guided_multimodal_fm_tpu.eval.viz import visualize_pairs
from ratio_guided_multimodal_fm_tpu.models import RatioEstimatorMNIST
from ratio_guided_multimodal_fm_tpu.sample import sample_bimodal_guided
from ratio_guided_multimodal_fm_tpu.train.checkpoint import get_checkpoint_path


def main(argv=None):
    parser = argparse.ArgumentParser(description="Sample bimodal pairs")
    parser.add_argument("--transform_type", type=str, default="rotate90")
    parser.add_argument("--guidance_method", type=str, default="none",
                        choices=["none", "mc_feng", "grad", "smc"],
                        help="none=independent, mc_feng=Feng MC guidance, "
                             "grad=gradient log-ratio, smc=particle-filter "
                             "guidance (sample/smc.py; no candidate pool)")
    parser.add_argument("--guidance_strength", type=float, default=0.5)
    parser.add_argument("--mc_batch_size", type=int, default=128)
    parser.add_argument("--loss_type", type=str, default="disc")
    parser.add_argument("--num_samples", type=int, default=64)
    parser.add_argument("--num_steps", type=int, default=100)
    add_solver_flag(parser)
    add_reflow_flag(parser)
    from ratio_guided_multimodal_fm_tpu.cli.common import add_ema_flag
    add_ema_flag(parser)
    from ratio_guided_multimodal_fm_tpu.cli.common import add_smc_flags
    add_smc_flags(parser)
    parser.add_argument("--ratio_clip", type=float, default=None,
                        help="Clip |log ratio| of MC samples (guards against "
                             "saturated-discriminator weight collapse)")
    parser.add_argument("--mc_refresh", type=int, default=1,
                        help="ABLATION ONLY — measured harmful. Fresh MC "
                             "candidate sets per trajectory (mc_feng only): "
                             "K>1 regenerates the N_mc set every "
                             "num_steps/K ODE steps inside the fused "
                             "sampler. Mid-flight re-ranking destroys "
                             "coherence (0.824 -> 0.363/0.213 at K=2/4, "
                             "FID 218 -> 452/641; ROUND5.md §2). "
                             "1 = reference protocol (keep it).")
    parser.add_argument("--ess_floor", type=float, default=None,
                        help="Adaptive guidance: per-trajectory gamma_eff = "
                             "gamma*min(1, ESS/ess_floor); mitigates "
                             "importance-weight collapse")
    parser.add_argument("--model", type=str, default="unet",
                        choices=["unet", "original"])
    add_common_flags(parser)
    args = parser.parse_args(argv)

    from ratio_guided_multimodal_fm_tpu.cli.common import init_runtime
    init_runtime(args)   # --device cpu override + multi-host init

    key = set_seed(args.seed)
    print(f"Random seed: {args.seed}")
    print(f"Backend: {jax.default_backend()}")

    model = fm_model(args.model, dtype=dtype_of(args))
    init = model.init(jax.random.PRNGKey(0),
                      jax.numpy.zeros((1, 28, 28, 1)), jax.numpy.zeros((1,)))
    template = init["params"]

    rf = "reflow" if args.reflow else None
    em = "ema" if getattr(args, "ema", False) else None
    path_x = get_checkpoint_path("flow", "x", None, rf, em, "best")
    path_y = get_checkpoint_path("flow", "y", args.transform_type, rf, em,
                                 "best")
    params_x = load_params_or_exit(
        path_x, template, "FM_x",
        "Please train FM_x first: python -m "
        "ratio_guided_multimodal_fm_tpu.cli.train_flow --modality x")
    params_y = load_params_or_exit(
        path_y, template, "FM_y",
        f"Please train FM_y first: python -m "
        f"ratio_guided_multimodal_fm_tpu.cli.train_flow --modality y "
        f"--transform_type {args.transform_type}")
    print(f"  Loaded FM_x from: {path_x}")
    print(f"  Loaded FM_y from: {path_y}")

    log_ratio = None
    if args.guidance_method != "none":
        ratio = RatioEstimatorMNIST(loss_type=args.loss_type)
        r_init = ratio.init(jax.random.PRNGKey(0),
                            jax.numpy.zeros((1, 28, 28, 1)),
                            jax.numpy.zeros((1, 28, 28, 1)))
        rem = "ema" if getattr(args, "ratio_ema", False) else None
        path_r = get_checkpoint_path("ratio", args.loss_type,
                                     args.transform_type, rem, "best")
        r_params = load_params_or_exit(
            path_r, r_init["params"], "Ratio estimator",
            f"Please train it first: python -m "
            f"ratio_guided_multimodal_fm_tpu.cli.train_ratio "
            f"--loss_type {args.loss_type} --transform_type {args.transform_type}")
        log_ratio = ratio_log_fn(ratio, {"params": r_params})
        print(f"  Loaded ratio estimator from: {path_r}")

    print(f"\nSampling {args.num_samples} pairs...")
    print(f"  Guidance method: {args.guidance_method}")
    if args.guidance_method != "none":
        print(f"  Guidance strength: {args.guidance_strength}")
        print(f"  MC batch size: {args.mc_batch_size}")
    print(f"  Integration steps: {args.num_steps}")

    if args.guidance_method == "smc":
        from ratio_guided_multimodal_fm_tpu.sample import sample_bimodal_smc

        samples_x, samples_y, diags = sample_bimodal_smc(
            velocity_fn(model, params_x), velocity_fn(model, params_y),
            log_ratio, guidance_strength=args.guidance_strength,
            num_samples=args.num_samples, num_steps=args.num_steps,
            x_shape=(28, 28, 1), y_shape=(28, 28, 1), key=key,
            churn=args.smc_churn, churn_iters=args.smc_churn_iters,
            resample_tau=args.smc_resample_tau,
            resample_t_min=args.smc_t_min, resample_t_max=args.smc_t_max,
            resample_group=args.smc_group,
            log_ratio_clip=args.ratio_clip, solver=args.solver,
            time_grid=args.time_grid, grid_power=args.grid_power,
            return_diagnostics=True)
    else:
        samples_x, samples_y, diags = sample_bimodal_guided(
            velocity_fn(model, params_x), velocity_fn(model, params_y),
            fm_pair_fn=maybe_merged_pair_fn(model, model, params_x, params_y,
                                            args),
            log_ratio_fn=log_ratio,
            guidance_method=args.guidance_method,
            guidance_strength=args.guidance_strength,
            num_samples=args.num_samples, num_steps=args.num_steps,
            mc_batch_size=args.mc_batch_size,
            x_shape=(28, 28, 1), y_shape=(28, 28, 1), key=key,
            log_ratio_clip=args.ratio_clip, ess_floor=args.ess_floor,
            solver=args.solver, time_grid=args.time_grid,
            grid_power=args.grid_power, mc_refresh=args.mc_refresh,
            return_diagnostics=True)

    os.makedirs("outputs", exist_ok=True)
    tag = (f"{args.guidance_method}"
           f"_gamma{args.guidance_strength}_{args.transform_type}")
    report_guidance_diagnostics(
        diags, args.num_steps,
        save_path=f"outputs/diagnostics_{tag}.json",
        time_grid=args.time_grid, grid_power=args.grid_power)
    save_path = f"outputs/samples_{tag}.png"
    visualize_pairs(samples_x, samples_y, save_path, args.transform_type)
    print("\nSampling complete!")


if __name__ == "__main__":
    main()
