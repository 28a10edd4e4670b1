"""Torch-side reconstruction of the reference's MISSING src/data/mnist_dataset.py.

The reference repo imports `src.data.mnist_dataset` (train_flow.py:20,
train_ratio.py:16, sample.py:27) but ships no such module (SURVEY §0/§2.9).
To run the reference end-to-end for the quality-parity comparison, this shim
is registered as `sys.modules['src.data.mnist_dataset']` by
run_torch_reference.py. It implements the call-site interface with the SAME
semantics as this framework's reconstruction
(ratio_guided_multimodal_fm_tpu/data/mnist_dataset.py):

* get_flow_dataloader(transform_type, batch_size, train): dict batches
  {'x': [B,1,28,28] in [-1,1], 'y': T(x), 'label'}.
* get_ratio_dataloader(transform_type, batch_size, real_fake_ratio): real
  pair = (x_i, T(x_j)) with label_j == label_i (random same-label partner),
  fake = different-label partner — mirroring the reference's own
  MNISTSVHNRatioDataset (mnist_svhn_dataset.py:93-99, :151-170).

Data comes from the IDX files under ./data/MNIST/raw (written by
export_idx.py), so torch and JAX train on identical bytes. Pure torch+numpy;
independent implementation, no code taken from the reference.
"""
from __future__ import annotations

import gzip
import os
import struct

import numpy as np
import torch
from torch.utils.data import DataLoader, Dataset

_ROOT = os.environ.get("PARITY_DATA_ROOT", "./data")


def _read_idx(path: str) -> np.ndarray:
    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "rb") as f:
        magic = struct.unpack(">I", f.read(4))[0]
        ndim = magic & 0xFF
        dims = struct.unpack(">" + "I" * ndim, f.read(4 * ndim))
        data = np.frombuffer(f.read(), np.uint8)
    return data.reshape(dims)


def _load(train: bool):
    raw = os.path.join(_ROOT, "MNIST", "raw")
    prefix = "train" if train else "t10k"
    imgs = _read_idx(os.path.join(raw, f"{prefix}-images-idx3-ubyte"))
    lbls = _read_idx(os.path.join(raw, f"{prefix}-labels-idx1-ubyte"))
    x = torch.from_numpy(imgs.astype(np.float32) / 127.5 - 1.0).unsqueeze(1)
    return x, torch.from_numpy(lbls.astype(np.int64))


def _transform(name, x: torch.Tensor) -> torch.Tensor:
    """Forward transform on [*,1,H,W]; rotate90 = 90° clockwise, so that
    evaluate.py's inverse (TF.rotate +90 = CCW) undoes it."""
    if name == "rotate90":
        return torch.rot90(x, k=-1, dims=(-2, -1))
    if name == "rotate180":
        return torch.rot90(x, k=2, dims=(-2, -1))
    if name == "rotate270":
        return torch.rot90(x, k=1, dims=(-2, -1))
    if name == "invert":
        return -x
    if name == "flip_h":
        return torch.flip(x, dims=(-1,))
    if name == "flip_v":
        return torch.flip(x, dims=(-2,))
    return x


class _FlowDataset(Dataset):
    def __init__(self, transform_type, train):
        self.x, self.labels = _load(train)
        self.transform_type = transform_type

    def __len__(self):
        return len(self.x)

    def __getitem__(self, idx):
        x = self.x[idx]
        y = _transform(self.transform_type, x) if self.transform_type else x
        return {"x": x, "y": y, "label": int(self.labels[idx])}


class _RatioDataset(Dataset):
    def __init__(self, transform_type, real_fake_ratio, train=True):
        self.x, self.labels = _load(train)
        self.y_all = _transform(transform_type, self.x)
        self.real_fake_ratio = real_fake_ratio
        lbl = self.labels.numpy()
        self.by_label = [np.flatnonzero(lbl == c) for c in range(10)]

    def __len__(self):
        return len(self.x)

    def __getitem__(self, idx):
        label_x = int(self.labels[idx])
        is_real = torch.rand(1).item() < self.real_fake_ratio
        if is_real:
            label_y = label_x
        else:
            label_y = int(np.random.choice(
                [c for c in range(10) if c != label_x]))
        j = int(np.random.choice(self.by_label[label_y]))
        return {
            "x": self.x[idx],
            "y": self.y_all[j],
            "is_real": 1 if is_real else 0,
            "label_x": label_x,
            "label_y": label_y,
        }


def get_flow_dataloader(transform_type=None, batch_size=128, train=True):
    ds = _FlowDataset(transform_type, train)
    return DataLoader(ds, batch_size=batch_size, shuffle=train,
                      num_workers=0, drop_last=True)


def get_ratio_dataloader(transform_type="rotate90", batch_size=128,
                         real_fake_ratio=0.5, train=True):
    ds = _RatioDataset(transform_type, real_fake_ratio, train)
    return DataLoader(ds, batch_size=batch_size, shuffle=train,
                      num_workers=0, drop_last=True)
