"""Train the asymmetric MNIST-SVHN ratio estimator.

Flag-parity with ref src/train_ratio_mnist_svhn.py:79-94; checkpoints
ratio_{loss_type}_mnist_svhn_{best|epochN}. BatchNorm encoders → the train
step threads the batch_stats collection.
"""
from __future__ import annotations

import argparse

import jax
import numpy as np

from ratio_guided_multimodal_fm_tpu.cli.common import (
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
from ratio_guided_multimodal_fm_tpu.train.loop import EarlyStopper
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
    add_common_flags(parser)
    args = parser.parse_args(argv)

    init_runtime(args)
    set_seed(args.seed)
    print(f"Random seed: {args.seed}")

    loader = wrap_loader(get_mnist_svhn_ratio_dataloader(
        batch_size=args.batch_size, real_fake_ratio=args.real_fake_ratio,
        train=True, root=args.data_root, seed=args.seed), args)

    model = RatioEstimatorMNISTSVHN(loss_type=args.loss_type)
    state = create_ratio_state(model, jax.random.PRNGKey(args.seed),
                               (32, 32, 1), (32, 32, 3), lr=args.lr,
                               has_batch_stats=True)
    print(f"Model parameters: {count_params(state.params):,}")

    step = make_ratio_train_step(model, args.loss_type, has_batch_stats=True)
    rng = RNG(args.seed + 1)
    stopper = EarlyStopper(patience=5)

    for epoch in range(args.epochs):
        ms = []
        for batch in loader:
            b = batch_to_jnp(batch)
            state, metrics = step(state, b["x"], b["y"], b["is_real"],
                                  rng.next())
            ms.append(metrics)
        avg = {k: float(np.mean([jax.device_get(m[k]) for m in ms]))
               for k in ms[0]}
        print(f"Epoch {epoch+1}/{args.epochs} - " +
              " - ".join(f"{k}: {v:.4f}" for k, v in avg.items()))

        tree = {"params": state.params, "batch_stats": state.batch_stats}
        if stopper.update(avg["loss"]):
            path = f"checkpoints/ratio_{args.loss_type}_mnist_svhn_best"
            save_checkpoint(path, tree, async_save=True)
            print(f"  -> Saved best model: {path}")
        if (epoch + 1) % 10 == 0:
            save_checkpoint(
                f"checkpoints/ratio_{args.loss_type}_mnist_svhn_epoch{epoch+1}",
                tree, async_save=True)
        if stopper.should_stop:
            print(f"\nEarly stopping after {epoch+1} epochs (patience=5)")
            break

    wait_for_saves()
    print("\nTraining complete!")


if __name__ == "__main__":
    main()
