"""Experiment-1 data module: MNIST ↔ transformed-MNIST pairs.

This is the module the reference REPO IS MISSING (SURVEY §2.9): train_flow.py,
train_ratio.py and sample.py import src.data.mnist_dataset which does not
exist. The interface below is reconstructed from those call sites:

* get_flow_dataloader(transform_type, batch_size, train) → batches
  {'x': [B,28,28,1], 'y': [B,28,28,1]} in [-1,1]; 'y' is transform(x)
  (train_flow.py:61-65 trains on batch[modality], flow_utils.py:131).
* get_ratio_dataloader(transform_type, batch_size, real_fake_ratio) →
  batches {'x','y','is_real'} (trainer.py:36-38); real pair =
  (img_i, T(img_j)) with label_j == label_i (random same-label partner),
  fake pair = different-label partner — mirroring the MNIST-SVHN ratio
  dataset exactly (mnist_svhn_dataset.py:93-99 real, :151-170 fake).
  Same-LABEL (not same-image) real pairing keeps the target coupling
  q(x,y) absolutely continuous w.r.t. the product of marginals; a
  same-image coupling is deterministic, its density ratio is singular,
  and mc_feng importance weights over independently-generated MC pairs
  degenerate (observed in round 1 as guidance *hurting* coherence).

Supported transform names per the inverse map in evaluate.py:40-53.
"""
from __future__ import annotations

from typing import Optional

import numpy as np

from ratio_guided_multimodal_fm_tpu.data.device_data import maybe_device_cache
from ratio_guided_multimodal_fm_tpu.data.pipeline import Pairing, to_unit_range
from ratio_guided_multimodal_fm_tpu.data.sources import load_mnist
from ratio_guided_multimodal_fm_tpu.data.transforms import apply_transform


class _EpochLoader:
    """Iterable over epochs of fixed-shape dict batches (drop-last)."""

    def __init__(self, make_iter, n_batches: int, seed: int = 0):
        self._make_iter = make_iter
        self._n = n_batches
        self._epoch = 0
        self._seed = seed

    def __len__(self):
        return self._n

    def epoch(self, e: int):
        """Iterator for epoch `e`, position-addressed: the batch order is a
        pure function of (seed, e), independent of how many epochs this
        process has already iterated. Preemption resume depends on this —
        a restarted process must reproduce epoch e's exact order
        (train/loop.py preemption contract; tests/test_preemption.py)."""
        return self._make_iter(np.random.RandomState(self._seed + e))

    def __iter__(self):
        it = self.epoch(self._epoch)
        self._epoch += 1
        return it


def get_flow_dataloader(transform_type: Optional[str] = None,
                        batch_size: int = 128, train: bool = True,
                        root: str = "./data", seed: int = 0) -> _EpochLoader:
    imgs_u8, labels = load_mnist(root, train)
    x = to_unit_range(imgs_u8)
    y = np.asarray(apply_transform(transform_type, x)) if transform_type else x
    x = maybe_device_cache(x)
    y = x if y is x else maybe_device_cache(y)
    n_batches = len(x) // batch_size

    def make_iter(rng):
        order = rng.permutation(len(x)) if train else np.arange(len(x))
        for b in range(n_batches):
            idx = order[b * batch_size:(b + 1) * batch_size]
            yield {"x": x[idx], "y": y[idx], "label": labels[idx]}

    return _EpochLoader(make_iter, n_batches, seed)


def get_flow_dataset(transform_type: Optional[str] = None,
                     train: bool = True, root: str = "./data"):
    """Full device-cached modality array for the FUSED K-step trainer
    (train/steps.py:make_fm_train_multistep): the whole normalized
    dataset goes to HBM once and sub-batches are gathered on-device from
    index chunks, so a K-step dispatch moves only a [K,B] int32 array."""
    imgs_u8, _ = load_mnist(root, train)
    x = to_unit_range(imgs_u8)
    if transform_type:
        x = np.asarray(apply_transform(transform_type, x))
    return maybe_device_cache(x)


def get_index_chunk_loader(n: int, batch_size: int, fused_steps: int,
                           train: bool = True, seed: int = 0) -> _EpochLoader:
    """Epoch loader of int32 [K, B] index chunks for the fused trainer.

    Same position-addressed epoch-order contract as the batch loaders
    (np.random.RandomState(seed + e) permutation), so preemption resume
    reproduces the order. Trailing batches that don't fill a K-chunk are
    dropped (documented in the --fused_steps help); with K=1 the chunking
    matches the plain loader's drop-last batch count exactly."""
    k, b = int(fused_steps), int(batch_size)
    n_chunks = n // (k * b)

    def make_iter(rng):
        order = rng.permutation(n) if train else np.arange(n)
        for c in range(n_chunks):
            idx = order[c * k * b:(c + 1) * k * b]
            yield np.ascontiguousarray(idx.reshape(k, b).astype(np.int32))

    return _EpochLoader(make_iter, n_chunks, seed)


def get_ratio_dataloader(transform_type: str = "rotate90",
                         batch_size: int = 128,
                         real_fake_ratio: float = 0.5,
                         train: bool = True, root: str = "./data",
                         seed: int = 0) -> _EpochLoader:
    imgs_u8, labels = load_mnist(root, train)
    x = to_unit_range(imgs_u8)
    y_all = maybe_device_cache(np.asarray(apply_transform(transform_type, x)))
    x = maybe_device_cache(x)
    pairing = Pairing(labels)
    n_batches = len(x) // batch_size

    def make_iter(rng):
        order = rng.permutation(len(x)) if train else np.arange(len(x))
        for b in range(n_batches):
            idx = order[b * batch_size:(b + 1) * batch_size]
            lbl = labels[idx]
            is_real = rng.rand(batch_size) < real_fake_ratio
            y_same = pairing.same_label(lbl, rng)
            y_diff, lbl_diff = pairing.different_label(lbl, rng)
            y_idx = np.where(is_real, y_same, y_diff)
            yield {
                "x": x[idx],
                "y": y_all[y_idx],
                "is_real": is_real.astype(np.float32),
                "label_x": lbl,
                "label_y": np.where(is_real, lbl, lbl_diff).astype(lbl.dtype),
            }

    return _EpochLoader(make_iter, n_batches, seed)


def get_ratio_index_loader(transform_type: str = "rotate90",
                           batch_size: int = 128, fused_steps: int = 1,
                           real_fake_ratio: float = 0.5,
                           train: bool = True, root: str = "./data",
                           seed: int = 0):
    """Fused-trainer twin of `get_ratio_dataloader`: returns
    (x_all, y_all, loader) where x_all/y_all are the full device-cached
    modality arrays and the loader yields dicts of int32/f32 chunks
    {'xidx': [K,B], 'yidx': [K,B], 'is_real': [K,B]} for
    `train/steps.py:make_ratio_train_multistep`. The pairing semantics
    (same-label real partner, different-label fake — ref
    mnist_svhn_dataset.py:93-99/:151-170) and the position-addressed
    epoch-order contract are identical to the batch loader; only the
    gather moves on-device."""
    imgs_u8, labels = load_mnist(root, train)
    x = to_unit_range(imgs_u8)
    y_all = maybe_device_cache(np.asarray(apply_transform(transform_type, x)))
    x = maybe_device_cache(x)
    pairing = Pairing(labels)
    k, b = int(fused_steps), int(batch_size)
    n_chunks = len(labels) // (k * b)

    def make_iter(rng):
        order = rng.permutation(len(labels)) if train else np.arange(
            len(labels))
        for c in range(n_chunks):
            idx = order[c * k * b:(c + 1) * k * b]
            lbl = labels[idx]
            is_real = rng.rand(k * b) < real_fake_ratio
            y_same = pairing.same_label(lbl, rng)
            y_diff, _ = pairing.different_label(lbl, rng)
            y_idx = np.where(is_real, y_same, y_diff)
            yield {
                "xidx": np.ascontiguousarray(
                    idx.reshape(k, b).astype(np.int32)),
                "yidx": np.ascontiguousarray(
                    y_idx.reshape(k, b).astype(np.int32)),
                "is_real": is_real.reshape(k, b).astype(np.float32),
            }

    return x, y_all, _EpochLoader(make_iter, n_chunks, seed)


def get_classifier_dataloader(batch_size: int = 128, train: bool = True,
                              root: str = "./data", seed: int = 0) -> _EpochLoader:
    """Plain (image, label) batches for the MNIST-28 eval classifier."""
    imgs_u8, labels = load_mnist(root, train)
    x = maybe_device_cache(to_unit_range(imgs_u8))
    n_batches = len(x) // batch_size

    def make_iter(rng):
        order = rng.permutation(len(x)) if train else np.arange(len(x))
        for b in range(n_batches):
            idx = order[b * batch_size:(b + 1) * batch_size]
            yield {"x": x[idx], "label": labels[idx]}

    return _EpochLoader(make_iter, n_batches, seed)
