"""Train the asymmetric MNIST-SVHN ratio estimator.

Flag-parity with ref src/train_ratio_mnist_svhn.py:79-94; checkpoints
ratio_{loss_type}_mnist_svhn_{best|epochN}. BatchNorm encoders → the train
step threads the batch_stats collection.
"""
from __future__ import annotations

import argparse

import jax

from ratio_guided_multimodal_fm_tpu.cli.common import (
    arm_preemption,
    init_runtime,
    wrap_loader,
    add_common_flags,
    batch_to_jnp,
    count_params,
)
from ratio_guided_multimodal_fm_tpu.core.prng import RNG, set_seed
from ratio_guided_multimodal_fm_tpu.data.mnist_svhn import (
    get_mnist_svhn_ratio_dataloader,
)
from ratio_guided_multimodal_fm_tpu.models import RatioEstimatorMNISTSVHN
from ratio_guided_multimodal_fm_tpu.train.checkpoint import (
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


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="Train MNIST-SVHN ratio estimator")
    parser.add_argument("--loss_type", type=str, default="disc",
                        choices=["disc", "rulsif"])
    parser.add_argument("--epochs", type=int, default=30)
    parser.add_argument("--batch_size", type=int, default=128)
    parser.add_argument("--lr", type=float, default=1e-4)
    parser.add_argument("--real_fake_ratio", type=float, default=0.5)
    parser.add_argument("--ema_decay", type=float, default=None,
                        help="Maintain a Polyak (EMA) average of the ratio "
                             "params; every best save writes a "
                             "ratio_*_ema_best sibling (EMA params + the "
                             "current BatchNorm stats) loadable with "
                             "--ratio_ema")
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

    loader = wrap_loader(get_mnist_svhn_ratio_dataloader(
        batch_size=args.batch_size, real_fake_ratio=args.real_fake_ratio,
        train=True, root=args.data_root, seed=args.seed), args)

    model = RatioEstimatorMNISTSVHN(loss_type=args.loss_type)
    state = create_ratio_state(model, jax.random.PRNGKey(args.seed),
                               (32, 32, 1), (32, 32, 3), lr=args.lr,
                               has_batch_stats=True,
                               ema_decay=args.ema_decay)
    print(f"Model parameters: {count_params(state.params):,}")

    step = make_ratio_train_step(model, args.loss_type, has_batch_stats=True,
                                 ema_decay=args.ema_decay)
    rng = RNG(args.seed + 1)

    state, resume = restore_preempt(args.preempt_path, state)
    if resume["start_epoch"] or resume["start_step"]:
        print(f"Resuming preempted run: epoch {resume['start_epoch']}, "
              f"step {resume['start_step']} "
              f"(best {resume['start_best']:.4f})")

    def save_best(s, epoch, best):
        path = f"checkpoints/ratio_{args.loss_type}_mnist_svhn_best"
        save_checkpoint(path, {"params": s.params,
                               "batch_stats": s.batch_stats},
                        async_save=True)
        print(f"  -> Saved best model: {path}")
        if getattr(s, "ema_params", None) is not None:
            from ratio_guided_multimodal_fm_tpu.train.checkpoint import (
                ema_checkpoint_path)
            # EMA params pair with the CURRENT BatchNorm stats — the
            # running averages are already an EMA of activation moments.
            save_checkpoint(ema_checkpoint_path(path),
                            {"params": s.ema_params,
                             "batch_stats": s.batch_stats},
                            async_save=True)
            print(f"  -> Saved EMA model: {ema_checkpoint_path(path)}")

    def save_periodic(s, epoch, best):
        save_checkpoint(
            f"checkpoints/ratio_{args.loss_type}_mnist_svhn_epoch{epoch}",
            {"params": s.params, "batch_stats": s.batch_stats},
            async_save=True)

    if args.fused_steps > 1:
        # Fused K-step dispatch (see train_ratio.py's branch): the v5e
        # bench measured this net's 2-8 ms steps tunnel-latency-bound —
        # K=16 lifts 131 -> 442 optimizer steps/s (bench_details.json).
        if jax.process_count() > 1:
            raise SystemExit("--fused_steps > 1 is single-process only "
                             "(multi-process DP shards host batches)")
        from ratio_guided_multimodal_fm_tpu.data.mnist_svhn import (
            get_mnist_svhn_ratio_index_loader,
        )
        from ratio_guided_multimodal_fm_tpu.train.steps import (
            make_ratio_train_multistep,
        )
        x_all, y_all, loader = get_mnist_svhn_ratio_index_loader(
            batch_size=args.batch_size, fused_steps=args.fused_steps,
            real_fake_ratio=args.real_fake_ratio, root=args.data_root,
            seed=args.seed)
        fused = make_ratio_train_multistep(model, args.loss_type,
                                           has_batch_stats=True,
                                           ema_decay=args.ema_decay)

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

    _, _, history = train_epochs(
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


if __name__ == "__main__":
    main()
