"""Train the ratio estimator r̂(x,y) for MNIST transforms.

Flag-parity with ref src/train_ratio.py:23-48; checkpoints
ratio_{loss_type}_{transform}_{best|epochN}; patience fixed at 5 like the
reference (train_ratio.py:87).
"""
from __future__ import annotations

import argparse

import jax
import numpy as np

from ratio_guided_multimodal_fm_tpu.cli.common import (
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
from ratio_guided_multimodal_fm_tpu.train.loop import EarlyStopper
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
    add_common_flags(parser)
    args = parser.parse_args(argv)

    init_runtime(args)
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
                               (28, 28, 1), (28, 28, 1), lr=args.lr)
    print(f"Model parameters: {count_params(state.params):,}")

    step = make_ratio_train_step(model, args.loss_type,
                                 alpha=args.rulsif_alpha,
                                 lambda_penalty=args.lambda_penalty)
    rng = RNG(args.seed + 1)
    stopper = EarlyStopper(patience=5)

    for epoch in range(args.epochs):
        ms = []
        for batch in loader:
            b = batch_to_jnp(batch)
            state, metrics = step(state, b["x"], b["y"], b["is_real"], rng.next())
            ms.append(metrics)
        avg = {k: float(np.mean([jax.device_get(m[k]) for m in ms]))
               for k in ms[0]}
        print(f"Epoch {epoch+1}/{args.epochs} - " +
              " - ".join(f"{k}: {v:.4f}" for k, v in avg.items()))

        if stopper.update(avg["loss"]):
            path = get_checkpoint_path("ratio", args.loss_type,
                                       args.transform_type, "best")
            save_checkpoint(path, state.params, async_save=True)
            print(f"  -> Saved best model: {path}")
        if (epoch + 1) % 10 == 0:
            save_checkpoint(get_checkpoint_path(
                "ratio", args.loss_type, args.transform_type,
                f"epoch{epoch+1}"), state.params, async_save=True)
        if stopper.should_stop:
            print(f"\nEarly stopping after {epoch+1} epochs (patience=5)")
            break

    wait_for_saves()
    print("\nTraining complete!")
    print(f"Best loss: {stopper.best:.4f}")


if __name__ == "__main__":
    main()
