"""Freeze the synthetic digit dataset as standard MNIST IDX files.

Writes train-images-idx3-ubyte / train-labels-idx1-ubyte / t10k-* under
<root>/MNIST/raw/, containing EXACTLY what the framework's synthetic
fallback generates (data/sources.py: generate_digits('mnist', 20000, seed=0)
train, (4000, seed=1) test). Both this framework's loaders (sources.py IDX
path) and torchvision's datasets.MNIST(download=False) read these files, so
the JAX stack and the torch reference train on identical bytes — the
precondition for the golden quality-parity curve (VERDICT round 1, item 1).

Usage: python scripts/parity/export_idx.py [--root ./data]
"""
from __future__ import annotations

import argparse
import os
import struct
import sys

import numpy as np

sys.path.insert(0, os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..", "..")))

from ratio_guided_multimodal_fm_tpu.data.synthetic import generate_digits  # noqa: E402


def write_idx_images(path: str, imgs: np.ndarray) -> None:
    """imgs: uint8 [N, H, W] (or [N,H,W,1])."""
    if imgs.ndim == 4:
        imgs = imgs[..., 0]
    n, h, w = imgs.shape
    with open(path, "wb") as f:
        f.write(struct.pack(">IIII", 0x00000803, n, h, w))
        f.write(np.ascontiguousarray(imgs, np.uint8).tobytes())


def write_idx_labels(path: str, labels: np.ndarray) -> None:
    with open(path, "wb") as f:
        f.write(struct.pack(">II", 0x00000801, len(labels)))
        f.write(np.ascontiguousarray(labels, np.uint8).tobytes())


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="./data")
    ap.add_argument("--n_train", type=int, default=20000)
    ap.add_argument("--n_test", type=int, default=4000)
    args = ap.parse_args()

    raw = os.path.join(args.root, "MNIST", "raw")
    os.makedirs(raw, exist_ok=True)

    tr_imgs, tr_lbls = generate_digits("mnist", args.n_train, seed=0,
                                       root=args.root)
    te_imgs, te_lbls = generate_digits("mnist", args.n_test, seed=1,
                                       root=args.root)

    write_idx_images(os.path.join(raw, "train-images-idx3-ubyte"), tr_imgs)
    write_idx_labels(os.path.join(raw, "train-labels-idx1-ubyte"), tr_lbls)
    write_idx_images(os.path.join(raw, "t10k-images-idx3-ubyte"), te_imgs)
    write_idx_labels(os.path.join(raw, "t10k-labels-idx1-ubyte"), te_lbls)
    print(f"wrote {args.n_train} train / {args.n_test} test digits -> {raw}")


if __name__ == "__main__":
    main()
