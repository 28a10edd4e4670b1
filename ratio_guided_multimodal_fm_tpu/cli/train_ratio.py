"""Train the ratio estimator r̂(x,y) for MNIST transforms.

Flag-parity with ref src/train_ratio.py:23-48; checkpoints
ratio_{loss_type}_{transform}_{best|epochN}; patience fixed at 5 like the
reference (train_ratio.py:87).
"""
from __future__ import annotations

import argparse

import jax

from ratio_guided_multimodal_fm_tpu.cli.common import (
    arm_preemption,
    init_runtime,
    wrap_loader,
    add_common_flags, count_params
)
from ratio_guided_multimodal_fm_tpu.core.prng import RNG, set_seed
from ratio_guided_multimodal_fm_tpu.data.mnist_dataset import get_ratio_dataloader
from ratio_guided_multimodal_fm_tpu.models import RatioEstimatorMNIST
from ratio_guided_multimodal_fm_tpu.train.checkpoint import (
    get_checkpoint_path,
    save_checkpoint,
    wait_for_saves,
)
from ratio_guided_multimodal_fm_tpu.train.loop import (
    epoch_data_iter,
    finish_preemptible,
    restore_preempt,
    train_epochs,
)
from ratio_guided_multimodal_fm_tpu.train.steps import (
    create_ratio_state,
    make_ratio_train_step,
)
from ratio_guided_multimodal_fm_tpu.cli.common import batch_to_jnp


def main(argv=None):
    parser = argparse.ArgumentParser(description="Train ratio estimator")
    parser.add_argument("--loss_type", type=str, default="disc",
                        choices=["disc", "rulsif"])
    parser.add_argument("--transform_type", type=str, default="rotate90")
    parser.add_argument("--epochs", type=int, default=30)
    parser.add_argument("--batch_size", type=int, default=128)
    parser.add_argument("--lr", type=float, default=1e-4)
    parser.add_argument("--real_fake_ratio", type=float, default=0.5)
    parser.add_argument("--rulsif_alpha", type=float, default=0.2)
    parser.add_argument("--lambda_penalty", type=float, default=0.1)
    parser.add_argument("--ema_decay", type=float, default=None,
                        help="Maintain a Polyak (EMA) average of the ratio "
                             "params; every best save writes a "
                             "ratio_*_ema_best sibling loadable with "
                             "--ratio_ema (saturation hedge — the EMA lags "
                             "the discriminator's late-epoch saturation)")
    parser.add_argument("--preempt_path", type=str, default=None,
                        help="Preemption-safe training: on SIGTERM, save a "
                             "step-granular resumable checkpoint here and "
                             "exit; if it exists at startup, resume from it")
    from ratio_guided_multimodal_fm_tpu.cli.common import add_fused_flag
    add_fused_flag(parser)
    from ratio_guided_multimodal_fm_tpu.cli.common import add_fast_rng_flag
    add_fast_rng_flag(parser)
    add_common_flags(parser)
    args = parser.parse_args(argv)

    init_runtime(args)
    arm_preemption()   # SIGTERM-safe from startup (train CLIs only)
    set_seed(args.seed)
    print(f"Random seed: {args.seed}")

    loader = wrap_loader(get_ratio_dataloader(
        transform_type=args.transform_type, batch_size=args.batch_size,
        real_fake_ratio=args.real_fake_ratio, root=args.data_root,
        seed=args.seed), args)
    print(f"Transform type: {args.transform_type}")
    print(f"Loss type: {args.loss_type}")
    print(f"Real/fake ratio: {args.real_fake_ratio}")

    model = RatioEstimatorMNIST(loss_type=args.loss_type)
    state = create_ratio_state(model, jax.random.PRNGKey(args.seed),
                               (28, 28, 1), (28, 28, 1), lr=args.lr,
                               ema_decay=args.ema_decay)
    print(f"Model parameters: {count_params(state.params):,}")

    step = make_ratio_train_step(model, args.loss_type,
                                 ema_decay=args.ema_decay,
                                 alpha=args.rulsif_alpha,
                                 lambda_penalty=args.lambda_penalty)
    rng = RNG(args.seed + 1)

    state, resume = restore_preempt(args.preempt_path, state)
    if resume["start_epoch"] or resume["start_step"]:
        print(f"Resuming preempted run: epoch {resume['start_epoch']}, "
              f"step {resume['start_step']} "
              f"(best {resume['start_best']:.4f})")

    def save_best(s, epoch, best):
        path = get_checkpoint_path("ratio", args.loss_type,
                                   args.transform_type, "best")
        save_checkpoint(path, s.params, async_save=True)
        print(f"  -> Saved best model: {path}")
        if getattr(s, "ema_params", None) is not None:
            from ratio_guided_multimodal_fm_tpu.train.checkpoint import (
                ema_checkpoint_path)
            save_checkpoint(ema_checkpoint_path(path), s.ema_params,
                            async_save=True)
            print(f"  -> Saved EMA model: {ema_checkpoint_path(path)}")

    def save_periodic(s, epoch, best):
        save_checkpoint(get_checkpoint_path(
            "ratio", args.loss_type, args.transform_type,
            f"epoch{epoch}"), s.params, async_save=True)

    if args.fused_steps > 1:
        # Fused K-step dispatch (see train_flow.py's branch): index
        # chunks in, K optimizer steps per program, gathers on-device.
        if jax.process_count() > 1:
            raise SystemExit("--fused_steps > 1 is single-process only "
                             "(multi-process DP shards host batches)")
        from ratio_guided_multimodal_fm_tpu.data.mnist_dataset import (
            get_ratio_index_loader,
        )
        from ratio_guided_multimodal_fm_tpu.train.steps import (
            make_ratio_train_multistep,
        )
        x_all, y_all, loader = get_ratio_index_loader(
            transform_type=args.transform_type,
            batch_size=args.batch_size, fused_steps=args.fused_steps,
            real_fake_ratio=args.real_fake_ratio, root=args.data_root,
            seed=args.seed)
        fused = make_ratio_train_multistep(model, args.loss_type,
                                           ema_decay=args.ema_decay,
                                           alpha=args.rulsif_alpha,
                                           lambda_penalty=args.lambda_penalty)

        def step_fn(s, b, k, _f=fused, _x=x_all, _y=y_all):
            return _f(s, _x, _y, b["xidx"], b["yidx"], b["is_real"], k)

        print(f"Fused dispatch: {args.fused_steps} steps/program, "
              f"{len(loader)} programs/epoch (epoch logs count programs)")
        data_iter = epoch_data_iter(loader)
    else:
        from ratio_guided_multimodal_fm_tpu.cli.common import multihost_adapt
        state, step_fn, extract = multihost_adapt(
            state, lambda s, b, k: step(s, b["x"], b["y"], b["is_real"], k),
            batch_to_jnp)
        data_iter = epoch_data_iter(loader, extract)

    _, best, history = train_epochs(
        state, step_fn,
        data_iter, args.epochs, rng,
        loss_key="loss",
        save_best_fn=save_best, save_periodic_fn=save_periodic,
        save_every=10, patience=5,
        preempt_path=args.preempt_path, **resume)

    if finish_preemptible(history, args.preempt_path):
        return
    wait_for_saves()
    print("\nTraining complete!")
    print(f"Best loss: {best:.4f}")


if __name__ == "__main__":
    main()
