"""Train an independent FM model for modality x or y (MNIST transforms).

Flag-parity with ref src/train_flow.py:26-49; checkpoint naming
flow_{modality}[_{transform}]_{best|epochN} via the shared path helper.

Usage:
    python -m ratio_guided_multimodal_fm_tpu.cli.train_flow --modality x --epochs 50
    python -m ratio_guided_multimodal_fm_tpu.cli.train_flow --modality y --transform_type rotate90
"""
from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp

from ratio_guided_multimodal_fm_tpu.cli.common import (
    arm_preemption,
    init_runtime,
    wrap_loader,
    add_common_flags,
    count_params,
    fm_model,
)
from ratio_guided_multimodal_fm_tpu.core.prng import RNG, set_seed
from ratio_guided_multimodal_fm_tpu.data.mnist_dataset import get_flow_dataloader
from ratio_guided_multimodal_fm_tpu.train.checkpoint import get_checkpoint_path
from ratio_guided_multimodal_fm_tpu.train.loop import train_flow_matching_epochs
from ratio_guided_multimodal_fm_tpu.train.steps import (
    create_fm_state,
    make_fm_train_step,
)


def main(argv=None):
    parser = argparse.ArgumentParser(description="Train Flow Matching model")
    parser.add_argument("--modality", type=str, required=True, choices=["x", "y"],
                        help="Modality to train (x=standard, y=transformed)")
    parser.add_argument("--transform_type", type=str, default="rotate90",
                        help="Transformation type for y modality")
    parser.add_argument("--epochs", type=int, default=50)
    parser.add_argument("--batch_size", type=int, default=128)
    parser.add_argument("--lr", type=float, default=1e-4)
    parser.add_argument("--save_every", type=int, default=10,
                        help="Save checkpoint every N epochs")
    parser.add_argument("--patience", type=int, default=10,
                        help="Early stopping patience")
    parser.add_argument("--model", type=str, default="unet",
                        choices=["unet", "original"])
    parser.add_argument("--ema_decay", type=float, default=None,
                        help="Polyak-average the weights with this decay "
                             "(e.g. 0.999); best saves also write "
                             "flow_*_ema_best, loadable with --ema on the "
                             "sample/evaluate CLIs")
    from ratio_guided_multimodal_fm_tpu.cli.common import add_fused_flag
    add_fused_flag(parser)
    from ratio_guided_multimodal_fm_tpu.cli.common import add_fast_rng_flag
    add_fast_rng_flag(parser)
    parser.add_argument("--metrics_dir", type=str, default=None,
                        help="Write JSONL epoch metrics here (observability)")
    parser.add_argument("--profile_dir", type=str, default=None,
                        help="Capture a jax.profiler trace of epoch 0")
    parser.add_argument("--preempt_path", type=str, default=None,
                        help="Preemption-safe training: on SIGTERM, save a "
                             "step-granular resumable checkpoint here and exit; "
                             "if it exists at startup, resume from it "
                             "(bit-exact vs the uninterrupted run)")
    add_common_flags(parser)
    args = parser.parse_args(argv)

    init_runtime(args)
    arm_preemption()   # SIGTERM-safe from startup (train CLIs only)
    set_seed(args.seed)
    print(f"Random seed: {args.seed}")
    print(f"Backend: {jax.default_backend()}")

    transform_for_loader = args.transform_type if args.modality == "y" else None
    loader = None
    if args.fused_steps <= 1:   # fused mode builds its own index loader
        loader = wrap_loader(get_flow_dataloader(
            transform_type=transform_for_loader, batch_size=args.batch_size,
            train=True, root=args.data_root, seed=args.seed), args)
    print(f"Training modality: {args.modality}")
    if args.modality == "y":
        print(f"Transform type: {args.transform_type}")

    model = fm_model(args.model)
    state = create_fm_state(model, jax.random.PRNGKey(args.seed), (28, 28, 1),
                            lr=args.lr, ema_decay=args.ema_decay)
    print(f"Model parameters: {count_params(state.params):,}")

    step = make_fm_train_step(model, ema_decay=args.ema_decay)
    rng = RNG(args.seed + 1)
    modality = args.modality

    best_path = get_checkpoint_path("flow", args.modality, transform_for_loader,
                                    "best")

    # Preemption auto-resume (SURVEY §5.3): a prior SIGTERM'd run left
    # {params, opt_state, epoch, step, partial metric sums}; restore and
    # skip to that position.
    from ratio_guided_multimodal_fm_tpu.train.loop import (
        epoch_data_iter,
        finish_preemptible,
        restore_preempt,
    )
    state, resume = restore_preempt(args.preempt_path, state)
    if resume["start_epoch"] or resume["start_step"]:
        print(f"Resuming preempted run: epoch {resume['start_epoch']}, "
              f"step {resume['start_step']} "
              f"(best {resume['start_best']:.4f})")

    if args.fused_steps > 1:
        # Fused K-step dispatch over the device-cached dataset: the loop
        # below iterates MACRO steps (idx chunks); each train_step call
        # runs K optimizer steps on-device. Incompatible with multi-process
        # DP (batches there are globally sharded host arrays).
        if jax.process_count() > 1:
            raise SystemExit("--fused_steps > 1 is single-process only "
                             "(multi-process DP shards host batches)")
        from ratio_guided_multimodal_fm_tpu.data.mnist_dataset import (
            get_flow_dataset,
            get_index_chunk_loader,
        )
        from ratio_guided_multimodal_fm_tpu.train.steps import (
            make_fm_train_multistep,
        )
        dataset = get_flow_dataset(transform_for_loader, train=True,
                                   root=args.data_root)
        loader = get_index_chunk_loader(len(dataset), args.batch_size,
                                        args.fused_steps, seed=args.seed)
        fused = make_fm_train_multistep(model, ema_decay=args.ema_decay)

        def step(state, idx, key, _f=fused, _d=dataset):
            return _f(state, _d, idx, key)

        print(f"Fused dispatch: {args.fused_steps} steps/program, "
              f"{len(loader)} programs/epoch (epoch logs count programs)")
        data_iter = epoch_data_iter(loader)
    else:
        # Multi-process DP (no-op single-process): replicate state over the
        # global mesh, shard batches over 'data' (cli/common.multihost_adapt).
        from ratio_guided_multimodal_fm_tpu.cli.common import multihost_adapt
        state, step, extract = multihost_adapt(
            state, step, lambda b: jnp.asarray(b[modality]))
        data_iter = epoch_data_iter(loader, extract)
    metrics_logger = None
    if args.metrics_dir:
        from ratio_guided_multimodal_fm_tpu.core.observability import MetricsLogger
        metrics_logger = MetricsLogger(
            args.metrics_dir, f"flow_{args.modality}")

    from ratio_guided_multimodal_fm_tpu.core.observability import profile_trace
    with profile_trace(args.profile_dir):
        _, _, history = train_flow_matching_epochs(
            state, step, data_iter, args.epochs, rng,
            best_path=best_path,
            periodic_path_fn=lambda e: get_checkpoint_path(
                "flow", args.modality, transform_for_loader, f"epoch{e}"),
            save_every=args.save_every, patience=args.patience,
            metrics_logger=metrics_logger,
            preempt_path=args.preempt_path, **resume)

    if finish_preemptible(history, args.preempt_path):
        return
    print("\nTraining complete!")


if __name__ == "__main__":
    main()
