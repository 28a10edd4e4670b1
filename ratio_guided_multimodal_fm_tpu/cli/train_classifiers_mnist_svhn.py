"""Train MNIST-32 + SVHN evaluation classifiers.

Flag-parity with ref src/train_classifiers_mnist_svhn.py:116-127; outputs
checkpoints/mnist32_classifier and checkpoints/svhn_classifier.
"""
from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

from ratio_guided_multimodal_fm_tpu.cli.common import add_common_flags, count_params
from ratio_guided_multimodal_fm_tpu.core.prng import RNG, set_seed
from ratio_guided_multimodal_fm_tpu.data.mnist_svhn import (
    get_mnist32_flow_dataloader,
    get_svhn_flow_dataloader,
)
from ratio_guided_multimodal_fm_tpu.models import MNISTClassifier32, SVHNClassifier
from ratio_guided_multimodal_fm_tpu.train.checkpoint import save_checkpoint
from ratio_guided_multimodal_fm_tpu.train.steps import (
    create_classifier_state,
    make_classifier_train_step,
)


def _train_one(name, model, has_bn, sample_shape, train_loader, test_loader,
               epochs, lr, seed):
    state = create_classifier_state(model, jax.random.PRNGKey(seed),
                                    sample_shape, lr=lr)
    print(f"\n=== Training {name} ===")
    print(f"Parameters: {count_params(state.params):,}")
    step = make_classifier_train_step(model, has_batch_stats=has_bn)

    def eval_logits(state, x):
        variables = {"params": state.params}
        if has_bn:
            variables["batch_stats"] = state.batch_stats
        return model.apply(variables, x, deterministic=True)

    eval_fn = jax.jit(eval_logits)
    rng = RNG(seed + 1)

    for epoch in range(epochs):
        losses, accs = [], []
        for batch in train_loader:
            state, (loss, acc) = step(state, jnp.asarray(batch["x"]),
                                      jnp.asarray(batch["label"]), rng.next())
            losses.append(loss)
            accs.append(acc)
        correct = total = 0
        for batch in test_loader:
            pred = np.asarray(eval_fn(state, jnp.asarray(batch["x"])).argmax(-1))
            correct += (pred == batch["label"]).sum()
            total += len(pred)
        print(f"Epoch {epoch+1}/{epochs} - "
              f"loss: {float(np.mean(jax.device_get(losses))):.4f} - "
              f"test_acc: {correct/total:.4f}")
    return state


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="Train MNIST32 and SVHN classifiers")
    parser.add_argument("--epochs", type=int, default=10)
    parser.add_argument("--batch_size", type=int, default=128)
    parser.add_argument("--lr", type=float, default=1e-3)
    add_common_flags(parser)
    args = parser.parse_args(argv)

    from ratio_guided_multimodal_fm_tpu.cli.common import init_runtime
    init_runtime(args)   # --device cpu override + multi-host init

    set_seed(args.seed)
    os.makedirs("checkpoints", exist_ok=True)

    m_train = get_mnist32_flow_dataloader(args.batch_size, True, args.data_root)
    m_test = get_mnist32_flow_dataloader(args.batch_size, False, args.data_root)
    state = _train_one("MNIST32 classifier", MNISTClassifier32(), False,
                       (32, 32, 1), m_train, m_test, args.epochs, args.lr,
                       args.seed)
    save_checkpoint("checkpoints/mnist32_classifier", state.params)
    print("Saved: checkpoints/mnist32_classifier")

    s_train = get_svhn_flow_dataloader(args.batch_size, True, args.data_root)
    s_test = get_svhn_flow_dataloader(args.batch_size, False, args.data_root)
    model = SVHNClassifier()
    state = _train_one("SVHN classifier", model, True, (32, 32, 3),
                       s_train, s_test, args.epochs, args.lr, args.seed)
    save_checkpoint("checkpoints/svhn_classifier",
                    {"params": state.params, "batch_stats": state.batch_stats})
    print("Saved: checkpoints/svhn_classifier")


if __name__ == "__main__":
    main()
