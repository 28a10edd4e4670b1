"""Generate MNIST-SVHN pairs via guided sampling.

Flag-parity with ref src/sample_mnist_svhn.py:247-265 (+ 'grad' method).
Outputs outputs/mnist_svhn/samples_{method}_gamma{γ}.png.
"""
from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp

from ratio_guided_multimodal_fm_tpu.cli.common import (
    add_common_flags,
    add_reflow_flag,
    add_solver_flag,
    load_params_or_exit,
    velocity_fn,
)
from ratio_guided_multimodal_fm_tpu.core.prng import set_seed
from ratio_guided_multimodal_fm_tpu.eval.viz import visualize_pairs_mnist_svhn
from ratio_guided_multimodal_fm_tpu.models import (
    FlowMatchingUNetMNIST,
    FlowMatchingUNetSVHN,
    RatioEstimatorMNISTSVHN,
)
from ratio_guided_multimodal_fm_tpu.sample import sample_bimodal_guided
from ratio_guided_multimodal_fm_tpu.train.checkpoint import (
    checkpoint_exists,
    load_checkpoint,
)


def load_mnist_svhn_models(loss_type: str, need_ratio: bool, dtype=None,
                           reflow: bool = False, ema: bool = False,
                           ratio_ema: bool = False):
    """Load FM_mnist32 + FM_svhn (+ ratio) from reference-named checkpoints.

    reflow=True loads the reflow-distilled flows (cli/reflow.py) for
    few-step sampling; ema=True loads the Polyak-averaged flow weights
    (flow_*_ema_best, trained with --ema_decay); ratio_ema=True loads the
    Polyak-averaged ratio weights (ratio_*_ema_best); the ratio estimator
    is shared (it only ever sees terminal-time samples)."""
    import jax.numpy as jnp

    kw = {"dtype": dtype} if dtype is not None else {}
    fm_mnist = FlowMatchingUNetMNIST(img_size=32, **kw)
    fm_svhn = FlowMatchingUNetSVHN(**kw)
    init_m = fm_mnist.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 1)),
                           jnp.zeros((1,)))
    init_s = fm_svhn.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)),
                          jnp.zeros((1,)))

    rf = "_reflow" if reflow else ""
    rf += "_ema" if ema else ""
    params_m = load_params_or_exit(
        f"checkpoints/flow_mnist32{rf}_best", init_m["params"], "FM_mnist",
        "Please train first: python -m "
        "ratio_guided_multimodal_fm_tpu.cli.train_flow_mnist32"
        + (" then distill: python -m ratio_guided_multimodal_fm_tpu.cli."
           "reflow --experiment mnist_svhn --flow mnist32" if reflow else ""))
    params_s = load_params_or_exit(
        f"checkpoints/flow_svhn{rf}_best", init_s["params"], "FM_svhn",
        "Please train first: python -m "
        "ratio_guided_multimodal_fm_tpu.cli.train_flow_svhn"
        + (" then distill: python -m ratio_guided_multimodal_fm_tpu.cli."
           "reflow --experiment mnist_svhn --flow svhn" if reflow else ""))

    ratio = log_ratio = None
    if need_ratio:
        ratio = RatioEstimatorMNISTSVHN(loss_type=loss_type, **kw)
        rem = "_ema" if ratio_ema else ""
        path_r = f"checkpoints/ratio_{loss_type}_mnist_svhn{rem}_best"
        if not checkpoint_exists(path_r):
            raise SystemExit(
                f"ERROR: Ratio estimator checkpoint not found: {path_r}\n"
                "Please train first: python -m "
                "ratio_guided_multimodal_fm_tpu.cli.train_ratio_mnist_svhn")
        tree = load_checkpoint(path_r)
        variables = {"params": tree["params"]}
        if "batch_stats" in tree:
            variables["batch_stats"] = tree["batch_stats"]

        def log_ratio(x, y):
            return ratio.apply(variables, x, y, method=ratio.log_ratio)

    return fm_mnist, params_m, fm_svhn, params_s, log_ratio


def main(argv=None):
    parser = argparse.ArgumentParser(description="Sample MNIST-SVHN pairs")
    parser.add_argument("--guidance_method", type=str, default="none",
                        choices=["none", "mc_feng", "grad", "smc"])
    parser.add_argument("--guidance_strength", type=float, default=0.5)
    parser.add_argument("--mc_batch_size", type=int, default=256)
    parser.add_argument("--loss_type", type=str, default="disc")
    parser.add_argument("--num_samples", type=int, default=32)
    parser.add_argument("--num_steps", type=int, default=100)
    add_solver_flag(parser)
    add_reflow_flag(parser)
    from ratio_guided_multimodal_fm_tpu.cli.common import (add_ema_flag,
                                                           add_smc_flags)
    add_ema_flag(parser)
    add_smc_flags(parser)
    # Measured exp-2 SMC knee: island-8 + tau-0.7 (ROUND5.md §3 — the
    # BatchNorm ratio net wants harder, smaller-scoped selection).
    parser.set_defaults(smc_group=8, smc_resample_tau=0.7)
    parser.add_argument("--ratio_clip", type=float, default=None,
                        help="Clip |log ratio| of MC samples")
    parser.add_argument("--mc_refresh", type=int, default=1,
                        help="ABLATION ONLY — measured harmful (coherence "
                             "0.824 -> 0.363/0.213 at K=2/4 on exp-1; "
                             "ROUND5.md §2). Fresh MC candidate sets per "
                             "trajectory (mc_feng only). 1 = reference "
                             "protocol (keep it).")
    parser.add_argument("--ess_floor", type=float, default=None,
                        help="Adaptive guidance: per-trajectory gamma_eff = "
                             "gamma*min(1, ESS/ess_floor)")
    add_common_flags(parser)
    args = parser.parse_args(argv)

    from ratio_guided_multimodal_fm_tpu.cli.common import init_runtime
    init_runtime(args)   # --device cpu override + multi-host init

    key = set_seed(args.seed)
    print(f"Random seed: {args.seed}")
    print(f"Backend: {jax.default_backend()}")

    from ratio_guided_multimodal_fm_tpu.cli.common import dtype_of
    fm_m, params_m, fm_s, params_s, log_ratio = load_mnist_svhn_models(
        args.loss_type, args.guidance_method != "none", dtype=dtype_of(args),
        reflow=args.reflow, ema=args.ema, ratio_ema=args.ratio_ema)

    print(f"\nSampling {args.num_samples} pairs "
          f"(method={args.guidance_method}, gamma={args.guidance_strength})")
    if args.guidance_method == "smc":
        from ratio_guided_multimodal_fm_tpu.sample import sample_bimodal_smc

        samples_x, samples_y, diags = sample_bimodal_smc(
            velocity_fn(fm_m, params_m), velocity_fn(fm_s, params_s),
            log_ratio, guidance_strength=args.guidance_strength,
            num_samples=args.num_samples, num_steps=args.num_steps,
            x_shape=(32, 32, 1), y_shape=(32, 32, 3), key=key,
            churn=args.smc_churn, churn_iters=args.smc_churn_iters,
            resample_tau=args.smc_resample_tau,
            resample_t_min=args.smc_t_min, resample_t_max=args.smc_t_max,
            resample_group=args.smc_group,
            log_ratio_clip=args.ratio_clip, solver=args.solver,
            time_grid=args.time_grid, grid_power=args.grid_power,
            return_diagnostics=True)
    else:
        samples_x, samples_y, diags = sample_bimodal_guided(
            velocity_fn(fm_m, params_m), velocity_fn(fm_s, params_s),
            log_ratio_fn=log_ratio,
            guidance_method=args.guidance_method,
            guidance_strength=args.guidance_strength,
            num_samples=args.num_samples, num_steps=args.num_steps,
            mc_batch_size=args.mc_batch_size,
            x_shape=(32, 32, 1), y_shape=(32, 32, 3), key=key,
            log_ratio_clip=args.ratio_clip, ess_floor=args.ess_floor,
            solver=args.solver, time_grid=args.time_grid,
            grid_power=args.grid_power, mc_refresh=args.mc_refresh,
            return_diagnostics=True)

    os.makedirs("outputs/mnist_svhn", exist_ok=True)
    from ratio_guided_multimodal_fm_tpu.cli.common import (
        report_guidance_diagnostics,
    )
    report_guidance_diagnostics(
        diags, args.num_steps,
        save_path=(f"outputs/mnist_svhn/diagnostics_{args.guidance_method}"
                   f"_gamma{args.guidance_strength}.json"),
        time_grid=args.time_grid, grid_power=args.grid_power)
    save_path = (f"outputs/mnist_svhn/samples_{args.guidance_method}"
                 f"_gamma{args.guidance_strength}.png")
    visualize_pairs_mnist_svhn(samples_x, samples_y, save_path)
    print("\nSampling complete!")


if __name__ == "__main__":
    main()
