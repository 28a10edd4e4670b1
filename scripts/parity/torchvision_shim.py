"""Minimal torchvision stand-in for running the torch reference offline.

torchvision is not installed in this environment; the reference imports it
in four places (train_classifier.py:11, evaluate.py:27,
train_classifiers_mnist_svhn.py:25, mnist_svhn_dataset.py:10). This shim
provides exactly the surface those call sites touch:

* datasets.MNIST(root, train, download, transform) — reads the frozen IDX
  files (export_idx.py); `download` is accepted and ignored.
* transforms.Compose / ToTensor / Normalize — the [-1,1] pipeline of
  train_classifier.py:88-91.
* transforms.functional.rotate(img, angle) / hflip / vflip — evaluate.py's
  inverse transforms (evaluate.py:40-53). Only right-angle rotations are
  used there, implemented exactly via torch.rot90 (positive angle = CCW,
  matching torchvision semantics).

Registered by run_torch_reference.py as sys.modules['torchvision'] etc.
"""
from __future__ import annotations

import gzip
import os
import struct
import sys
import types

import numpy as np
import torch


def _read_idx(path: str) -> np.ndarray:
    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "rb") as f:
        magic = struct.unpack(">I", f.read(4))[0]
        ndim = magic & 0xFF
        dims = struct.unpack(">" + "I" * ndim, f.read(4 * ndim))
        data = np.frombuffer(f.read(), np.uint8)
    return data.reshape(dims)


class Compose:
    def __init__(self, fns):
        self.fns = fns

    def __call__(self, x):
        for f in self.fns:
            x = f(x)
        return x


class ToTensor:
    def __call__(self, x):
        if isinstance(x, np.ndarray):
            if x.ndim == 2:
                x = x[None]
            return torch.from_numpy(x.astype(np.float32) / 255.0)
        return torch.as_tensor(x, dtype=torch.float32)


class Normalize:
    def __init__(self, mean, std):
        self.mean = torch.tensor(mean).view(-1, 1, 1)
        self.std = torch.tensor(std).view(-1, 1, 1)

    def __call__(self, x):
        return (x - self.mean) / self.std


class Resize:
    def __init__(self, size):
        self.size = (size, size) if isinstance(size, int) else tuple(size)

    def __call__(self, x):
        return torch.nn.functional.interpolate(
            x[None], size=self.size, mode="bilinear", align_corners=False)[0]


class MNIST(torch.utils.data.Dataset):
    def __init__(self, root="./data", train=True, download=False,
                 transform=None):
        raw = os.path.join(root, "MNIST", "raw")
        prefix = "train" if train else "t10k"
        self.images = _read_idx(
            os.path.join(raw, f"{prefix}-images-idx3-ubyte"))
        self.labels = _read_idx(
            os.path.join(raw, f"{prefix}-labels-idx1-ubyte")).astype(np.int64)
        self.transform = transform

    def __len__(self):
        return len(self.images)

    def __getitem__(self, idx):
        img = self.images[idx]
        if self.transform is not None:
            img = self.transform(img)
        return img, int(self.labels[idx])


class SVHN(torch.utils.data.Dataset):
    def __init__(self, root="./data", split="train", download=False,
                 transform=None):
        from scipy.io import loadmat

        m = loadmat(os.path.join(root, f"{split}_32x32.mat"))
        self.images = np.transpose(m["X"], (3, 0, 1, 2))  # HWCN -> NHWC
        labels = m["y"].squeeze().astype(np.int64)
        labels[labels == 10] = 0
        self.labels = labels
        self.transform = transform

    def __len__(self):
        return len(self.images)

    def __getitem__(self, idx):
        img = self.images[idx]  # uint8 HWC
        if self.transform is not None:
            img = self.transform(np.transpose(img, (2, 0, 1)))
        return img, int(self.labels[idx])


def rotate(img: torch.Tensor, angle: float) -> torch.Tensor:
    a = int(angle) % 360
    k = {0: 0, 90: 1, 180: 2, 270: 3}.get(a)
    if k is None:
        raise NotImplementedError(f"shim only supports right angles, got {angle}")
    return torch.rot90(img, k=k, dims=(-2, -1))


def hflip(img: torch.Tensor) -> torch.Tensor:
    return torch.flip(img, dims=(-1,))


def vflip(img: torch.Tensor) -> torch.Tensor:
    return torch.flip(img, dims=(-2,))


def install() -> None:
    """Register fake torchvision/{datasets,transforms,transforms.functional}."""
    tv = types.ModuleType("torchvision")
    datasets_mod = types.ModuleType("torchvision.datasets")
    datasets_mod.MNIST = MNIST
    datasets_mod.SVHN = SVHN
    transforms_mod = types.ModuleType("torchvision.transforms")
    transforms_mod.Compose = Compose
    transforms_mod.ToTensor = ToTensor
    transforms_mod.Normalize = Normalize
    transforms_mod.Resize = Resize
    tf_mod = types.ModuleType("torchvision.transforms.functional")
    tf_mod.rotate = rotate
    tf_mod.hflip = hflip
    tf_mod.vflip = vflip
    transforms_mod.functional = tf_mod
    tv.datasets = datasets_mod
    tv.transforms = transforms_mod
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.datasets"] = datasets_mod
    sys.modules["torchvision.transforms"] = transforms_mod
    sys.modules["torchvision.transforms.functional"] = tf_mod
