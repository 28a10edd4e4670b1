"""MNIST↔SVHN paired data (experiment 2).

Parity with ref mnist_svhn_dataset.py: MNIST resized 28→32, both modalities
normalized to [-1,1]; label-aligned pairs with a fresh random same-label
SVHN partner per epoch (D1, :85-105); ratio batches with Bernoulli real/fake
and different-label fakes (D2, :108-170); SVHN-only and MNIST32-only flow
loaders (D3/D4).
"""
from __future__ import annotations

import numpy as np

from ratio_guided_multimodal_fm_tpu.data.device_data import maybe_device_cache
from ratio_guided_multimodal_fm_tpu.data.mnist_dataset import _EpochLoader
from ratio_guided_multimodal_fm_tpu.data.pipeline import (
    Pairing,
    paired_batches,
    ratio_batches,
    to_unit_range,
)
from ratio_guided_multimodal_fm_tpu.data.sources import (
    load_mnist,
    load_svhn,
    resize_images,
)

_CACHE = {}


def _mnist32(root, train):
    key = ("mnist32", root, train)
    if key not in _CACHE:
        imgs, labels = load_mnist(root, train)
        _CACHE[key] = (maybe_device_cache(
            to_unit_range(resize_images(imgs, 32))), labels)
    return _CACHE[key]


def _svhn(root, train):
    key = ("svhn", root, train)
    if key not in _CACHE:
        imgs, labels = load_svhn(root, train)
        _CACHE[key] = (maybe_device_cache(to_unit_range(imgs)), labels)
    return _CACHE[key]


def get_mnist_svhn_dataloader(batch_size: int = 128, train: bool = True,
                              root: str = "./data", seed: int = 0,
                              **_ignored) -> _EpochLoader:
    """Batches {'x': [B,32,32,1], 'y': [B,32,32,3], 'label': [B]}."""
    x, xl = _mnist32(root, train)
    y, yl = _svhn(root, train)
    pairing = Pairing(yl)
    n_batches = len(x) // batch_size

    def make_iter(rng):
        return paired_batches(x, xl, y, pairing, batch_size, rng, shuffle=train)

    return _EpochLoader(make_iter, n_batches, seed)


def get_mnist_svhn_ratio_dataloader(batch_size: int = 128,
                                    real_fake_ratio: float = 0.5,
                                    train: bool = True, root: str = "./data",
                                    seed: int = 0, **_ignored) -> _EpochLoader:
    x, xl = _mnist32(root, train)
    y, yl = _svhn(root, train)
    pairing = Pairing(yl)
    n_batches = len(x) // batch_size

    def make_iter(rng):
        return ratio_batches(x, xl, y, pairing, batch_size, rng,
                             real_fake_ratio=real_fake_ratio, shuffle=train)

    return _EpochLoader(make_iter, n_batches, seed)


def get_mnist_svhn_ratio_index_loader(batch_size: int = 128,
                                      fused_steps: int = 1,
                                      real_fake_ratio: float = 0.5,
                                      train: bool = True,
                                      root: str = "./data", seed: int = 0):
    """Fused-trainer twin of `get_mnist_svhn_ratio_dataloader`: returns
    (x_all, y_all, loader) where x_all/y_all are the device-cached full
    modality arrays and the loader yields
    {'xidx': [K,B], 'yidx': [K,B], 'is_real': [K,B]} chunks for
    `train/steps.py:make_ratio_train_multistep`. Pairing semantics are
    `pipeline.ratio_batches` exactly (same-label real partner,
    different-label fake, Bernoulli per item — ref
    mnist_svhn_dataset.py:108-170); only the gathers move on-device.
    Mirrors mnist_dataset.py:get_ratio_index_loader for experiment 1."""
    x, xl = _mnist32(root, train)
    y, yl = _svhn(root, train)
    pairing = Pairing(yl)
    k, b = int(fused_steps), int(batch_size)
    n_chunks = len(xl) // (k * b)

    def make_iter(rng):
        order = rng.permutation(len(xl)) if train else np.arange(len(xl))
        for c in range(n_chunks):
            idx = order[c * k * b:(c + 1) * k * b]
            lbl = xl[idx]
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

    return x, y, _EpochLoader(make_iter, n_chunks, seed)


def get_svhn_flow_dataloader(batch_size: int = 128, train: bool = True,
                             root: str = "./data", seed: int = 0,
                             **_ignored) -> _EpochLoader:
    """SVHN-only batches {'x','y'(same),'label'} (ref D3 loop-compat)."""
    y, yl = _svhn(root, train)
    n_batches = len(y) // batch_size

    def make_iter(rng):
        order = rng.permutation(len(y)) if train else np.arange(len(y))
        for b in range(n_batches):
            idx = order[b * batch_size:(b + 1) * batch_size]
            yield {"x": y[idx], "y": y[idx], "label": yl[idx]}

    return _EpochLoader(make_iter, n_batches, seed)


def get_mnist32_flow_dataloader(batch_size: int = 128, train: bool = True,
                                root: str = "./data", seed: int = 0,
                                **_ignored) -> _EpochLoader:
    """MNIST-32 batches {'x','label'} (ref D4)."""
    x, xl = _mnist32(root, train)
    n_batches = len(x) // batch_size

    def make_iter(rng):
        order = rng.permutation(len(x)) if train else np.arange(len(x))
        for b in range(n_batches):
            idx = order[b * batch_size:(b + 1) * batch_size]
            yield {"x": x[idx], "label": xl[idx]}

    return _EpochLoader(make_iter, n_batches, seed)
