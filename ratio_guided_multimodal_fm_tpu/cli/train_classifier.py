"""Train the MNIST-28 evaluation classifier → checkpoints/mnist_classifier.

Flag-parity with ref src/train_classifier.py:72-80 (epochs 3, lr 1e-3).
"""
from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

from ratio_guided_multimodal_fm_tpu.cli.common import add_common_flags, count_params
from ratio_guided_multimodal_fm_tpu.core.prng import RNG, set_seed
from ratio_guided_multimodal_fm_tpu.data.mnist_dataset import get_classifier_dataloader
from ratio_guided_multimodal_fm_tpu.models import MNISTClassifier
from ratio_guided_multimodal_fm_tpu.train.checkpoint import save_checkpoint
from ratio_guided_multimodal_fm_tpu.train.steps import (
    create_classifier_state,
    make_classifier_train_step,
)


def main(argv=None):
    parser = argparse.ArgumentParser(description="Train MNIST classifier")
    parser.add_argument("--epochs", type=int, default=3)
    parser.add_argument("--batch_size", type=int, default=128)
    parser.add_argument("--lr", type=float, default=1e-3)
    add_common_flags(parser)
    args = parser.parse_args(argv)

    from ratio_guided_multimodal_fm_tpu.cli.common import init_runtime
    init_runtime(args)   # --device cpu override + multi-host init

    set_seed(args.seed)
    train_loader = get_classifier_dataloader(args.batch_size, train=True,
                                             root=args.data_root, seed=args.seed)
    test_loader = get_classifier_dataloader(args.batch_size, train=False,
                                            root=args.data_root, seed=args.seed)

    model = MNISTClassifier()
    state = create_classifier_state(model, jax.random.PRNGKey(args.seed),
                                    (28, 28, 1), lr=args.lr)
    print(f"Model parameters: {count_params(state.params):,}")

    step = make_classifier_train_step(model)
    eval_fn = jax.jit(lambda params, x: model.apply({"params": params}, x))
    rng = RNG(args.seed + 1)

    for epoch in range(args.epochs):
        losses, accs = [], []
        for batch in train_loader:
            state, (loss, acc) = step(state, jnp.asarray(batch["x"]),
                                      jnp.asarray(batch["label"]), rng.next())
            losses.append(loss)
            accs.append(acc)
        correct = total = 0
        for batch in test_loader:
            logits = eval_fn(state.params, jnp.asarray(batch["x"]))
            pred = np.asarray(logits.argmax(-1))
            correct += (pred == batch["label"]).sum()
            total += len(pred)
        print(f"Epoch {epoch+1}/{args.epochs} - "
              f"loss: {float(np.mean(jax.device_get(losses))):.4f} - "
              f"train_acc: {float(np.mean(jax.device_get(accs))):.4f} - "
              f"test_acc: {correct/total:.4f}")

    os.makedirs("checkpoints", exist_ok=True)
    save_checkpoint("checkpoints/mnist_classifier", state.params)
    print("Saved: checkpoints/mnist_classifier")


if __name__ == "__main__":
    main()
