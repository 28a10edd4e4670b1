"""Train FM on MNIST-32 (experiment 2, modality x).

Flag-parity with ref src/train_flow_mnist32.py:64-81 including --resume;
checkpoints flow_mnist32_{best|epochN} in full-dict format for resume.
"""
from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from ratio_guided_multimodal_fm_tpu.cli.common import (
    arm_preemption,
    init_runtime,
    wrap_loader,
    add_common_flags, count_params
)
from ratio_guided_multimodal_fm_tpu.core.prng import RNG, set_seed
from ratio_guided_multimodal_fm_tpu.data.mnist_svhn import get_mnist32_flow_dataloader
from ratio_guided_multimodal_fm_tpu.models import FlowMatchingUNetMNIST
from ratio_guided_multimodal_fm_tpu.train.checkpoint import (
    load_checkpoint,
    save_train_checkpoint,
)
from ratio_guided_multimodal_fm_tpu.train.loop import (
    epoch_data_iter,
    finish_preemptible,
    restore_preempt,
    train_epochs,
)
from ratio_guided_multimodal_fm_tpu.train.steps import (
    create_fm_state,
    make_fm_train_step,
)


def run_flow_training(model, sample_shape, loader, args, ckpt_prefix: str,
                      dataset=None):
    """Shared driver for the mnist32/svhn flow scripts (--resume support,
    step-granular --preempt_path preemption — SURVEY §5.3).

    `dataset`: the full (device-cached) modality array backing `loader`.
    When provided AND --fused_steps > 1, training switches to the fused
    K-step dispatch (train/steps.py:make_fm_train_multistep): the epoch
    loop iterates [K,B] index chunks and each train_step call runs K
    optimizer steps on-device."""
    ema_decay = getattr(args, "ema_decay", None)
    state = create_fm_state(model, jax.random.PRNGKey(args.seed),
                            sample_shape, lr=args.lr, ema_decay=ema_decay)
    print(f"Model parameters: {count_params(state.params):,}")

    start_epoch, best_loss = 0, float("inf")
    if args.resume:
        print(f"Resuming from checkpoint: {args.resume}")
        ckpt = load_checkpoint(args.resume)
        if isinstance(ckpt, dict) and "params" in ckpt:
            from ratio_guided_multimodal_fm_tpu.train.checkpoint import load_params
            state = state.replace(params=load_params(args.resume, state.params)
                                  if "opt_state" not in ckpt else state.params)
            # full restore when opt_state present
            if "opt_state" in ckpt:
                restored = load_checkpoint(args.resume, target={
                    "params": state.params, "opt_state": state.opt_state,
                    "epoch": np.int64(0), "best_loss": np.float64(0)})
                state = state.replace(params=restored["params"],
                                      opt_state=restored["opt_state"])
                start_epoch = int(restored["epoch"])
                best_loss = float(restored["best_loss"])
        else:
            from ratio_guided_multimodal_fm_tpu.train.checkpoint import load_params
            state = state.replace(params=load_params(args.resume, state.params))
        if state.ema_params is not None:
            # Re-seed the Polyak average from the RESTORED weights (a
            # copy, not an alias — donated steps must not see the same
            # buffer twice): otherwise the fresh random init would
            # contaminate the EMA for ~1/(1-decay) steps after resume.
            state = state.replace(ema_params=jax.tree_util.tree_map(
                jnp.array, state.params))
        print(f"  Resumed at epoch {start_epoch}, best_loss={best_loss:.4f}")

    # Step-granular preemption resume takes precedence over the
    # epoch-granular --resume when its checkpoint exists.
    preempt_path = getattr(args, "preempt_path", None)
    state, resume = restore_preempt(preempt_path, state)
    if resume["start_epoch"] or resume["start_step"]:
        print(f"Resuming preempted run: epoch {resume['start_epoch']}, "
              f"step {resume['start_step']} "
              f"(best {resume['start_best']:.4f})")
    else:
        resume["start_epoch"] = start_epoch    # from --resume (epoch-level)
        resume["start_best"] = best_loss

    rng = RNG(args.seed + 1)
    fused_k = int(getattr(args, "fused_steps", 1) or 1)
    if fused_k > 1 and dataset is not None:
        if jax.process_count() > 1:
            raise SystemExit("--fused_steps > 1 is single-process only "
                             "(multi-process DP shards host batches)")
        from ratio_guided_multimodal_fm_tpu.data.mnist_dataset import (
            get_index_chunk_loader,
        )
        from ratio_guided_multimodal_fm_tpu.train.steps import (
            make_fm_train_multistep,
        )
        loader = get_index_chunk_loader(len(dataset), args.batch_size,
                                        fused_k, seed=args.seed)
        fused = make_fm_train_multistep(model, ema_decay=ema_decay)

        def step_fn(s, idx, k, _f=fused, _d=dataset):
            return _f(s, _d, idx, k)

        extract = None
        print(f"Fused dispatch: {fused_k} steps/program, "
              f"{len(loader)} programs/epoch (epoch logs count programs)")
    else:
        step = make_fm_train_step(model, ema_decay=ema_decay)

        from ratio_guided_multimodal_fm_tpu.cli.common import multihost_adapt
        state, step_fn, extract = multihost_adapt(
            state, lambda s, x, k: step(s, x, k),
            lambda b: jnp.asarray(b["x"]))

    def save_best(s, epoch, best):
        path = f"checkpoints/{ckpt_prefix}_best"
        save_train_checkpoint(path, s, epoch, best)
        print(f"  -> Saved best model: {path}")
        if getattr(s, "ema_params", None) is not None:
            from ratio_guided_multimodal_fm_tpu.train.checkpoint import (
                save_checkpoint)
            epath = f"checkpoints/{ckpt_prefix}_ema_best"
            save_checkpoint(epath, s.ema_params, async_save=True)
            print(f"  -> Saved EMA model: {epath}")

    def save_periodic(s, epoch, best):
        path = f"checkpoints/{ckpt_prefix}_epoch{epoch}"
        save_train_checkpoint(path, s, epoch, best)
        print(f"  -> Saved checkpoint: {path}")

    _, best, history = train_epochs(
        state, step_fn,
        (epoch_data_iter(loader) if extract is None
         else epoch_data_iter(loader, extract)),
        args.epochs, rng,
        loss_key=None,
        save_best_fn=save_best, save_periodic_fn=save_periodic,
        save_every=args.save_every, patience=args.patience,
        preempt_path=preempt_path, **resume)

    if finish_preemptible(history, preempt_path):
        return
    print("\nTraining complete!")
    print(f"Best loss: {best:.4f}")


def main(argv=None):
    parser = argparse.ArgumentParser(description="Train FM on MNIST 32x32")
    parser.add_argument("--epochs", type=int, default=50)
    parser.add_argument("--batch_size", type=int, default=128)
    parser.add_argument("--lr", type=float, default=1e-4)
    parser.add_argument("--save_every", type=int, default=10)
    parser.add_argument("--patience", type=int, default=10)
    parser.add_argument("--resume", type=str, default=None,
                        help="Path to checkpoint to resume from")
    parser.add_argument("--ema_decay", type=float, default=None,
                        help="Polyak-average the weights with this decay "
                             "(e.g. 0.999); best saves also write "
                             "flow_*_ema_best, loadable with --ema on the "
                             "sample/evaluate CLIs")
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
    loader = wrap_loader(get_mnist32_flow_dataloader(
        args.batch_size, True, args.data_root, seed=args.seed), args)
    model = FlowMatchingUNetMNIST(img_size=32)
    from ratio_guided_multimodal_fm_tpu.data.mnist_svhn import _mnist32
    run_flow_training(model, (32, 32, 1), loader, args, "flow_mnist32",
                      dataset=_mnist32(args.data_root, True)[0])


if __name__ == "__main__":
    main()
