"""Host-side input pipeline: label pairing + fixed-shape batch iterators.

TPU-first design vs the reference:
* The reference re-rolls per-item randomness inside DataLoader workers every
  __getitem__ (mnist_svhn_dataset.py:93-99, 139-170). Here the per-label
  index tables are built ONCE (Pairing), and each epoch draws all pairings
  vectorized in one numpy call — no worker processes, no Python-per-item.
* All iterators yield fixed-shape numpy batches (drop-last), so every train
  step hits the same compiled XLA program.
"""
from __future__ import annotations

from typing import Dict, Iterator

import numpy as np


def to_unit_range(imgs_u8: np.ndarray) -> np.ndarray:
    """uint8 [0,255] → float32 [-1,1] (reference Normalize(0.5, 0.5))."""
    return imgs_u8.astype(np.float32) / 127.5 - 1.0


class Pairing:
    """Per-label index tables for label-aligned and label-mismatched pairing.

    Replaces the reference's per-item np.random.choice over python dicts
    (mnist_svhn_dataset.py:58-99) with vectorized draws over padded tables.
    """

    def __init__(self, labels: np.ndarray, num_classes: int = 10):
        self.num_classes = num_classes
        self.by_label = [np.flatnonzero(labels == c) for c in range(num_classes)]
        for c, idxs in enumerate(self.by_label):
            if len(idxs) == 0:
                raise ValueError(f"No samples for class {c}")
        self.labels = labels

    def same_label(self, labels: np.ndarray, rng: np.random.RandomState) -> np.ndarray:
        """For each query label, a random partner index with the SAME label."""
        out = np.empty(len(labels), np.int64)
        for c in range(self.num_classes):
            m = labels == c
            n = int(m.sum())
            if n:
                out[m] = self.by_label[c][rng.randint(0, len(self.by_label[c]), n)]
        return out

    def different_label(self, labels: np.ndarray, rng: np.random.RandomState):
        """Random partner with a DIFFERENT label (ref :151-170).

        Returns (partner_indices, partner_labels).
        """
        shift = rng.randint(1, self.num_classes, len(labels))
        tgt = (labels + shift) % self.num_classes
        out = np.empty(len(labels), np.int64)
        for c in range(self.num_classes):
            m = tgt == c
            n = int(m.sum())
            if n:
                out[m] = self.by_label[c][rng.randint(0, len(self.by_label[c]), n)]
        return out, tgt


def _epoch_order(n: int, batch_size: int, shuffle: bool,
                 rng: np.random.RandomState) -> np.ndarray:
    order = rng.permutation(n) if shuffle else np.arange(n)
    n_batches = n // batch_size
    return order[: n_batches * batch_size].reshape(n_batches, batch_size)


def flow_batches(images: np.ndarray, labels: np.ndarray, batch_size: int,
                 rng: np.random.RandomState, shuffle: bool = True,
                 ) -> Iterator[Dict[str, np.ndarray]]:
    """Single-modality flow batches {'x', 'label'} (ref D4 semantics)."""
    for idx in _epoch_order(len(images), batch_size, shuffle, rng):
        yield {"x": images[idx], "label": labels[idx]}


def paired_batches(x_images: np.ndarray, x_labels: np.ndarray,
                   y_images: np.ndarray, y_pairing: "Pairing",
                   batch_size: int, rng: np.random.RandomState,
                   shuffle: bool = True) -> Iterator[Dict[str, np.ndarray]]:
    """Label-aligned cross-modality batches {'x','y','label'} (ref D1)."""
    for idx in _epoch_order(len(x_images), batch_size, shuffle, rng):
        lbl = x_labels[idx]
        y_idx = y_pairing.same_label(lbl, rng)
        yield {"x": x_images[idx], "y": y_images[y_idx], "label": lbl}


def ratio_batches(x_images: np.ndarray, x_labels: np.ndarray,
                  y_images: np.ndarray, y_pairing: "Pairing",
                  batch_size: int, rng: np.random.RandomState,
                  real_fake_ratio: float = 0.5, shuffle: bool = True,
                  ) -> Iterator[Dict[str, np.ndarray]]:
    """Real-vs-fake ratio batches {'x','y','is_real','label_x','label_y'}.

    Real: same-label partner; fake: different-label partner; Bernoulli
    real/fake per item (ref D2, mnist_svhn_dataset.py:108-170).
    """
    for idx in _epoch_order(len(x_images), batch_size, shuffle, rng):
        lbl = x_labels[idx]
        is_real = (rng.rand(len(idx)) < real_fake_ratio)
        y_same = y_pairing.same_label(lbl, rng)
        y_diff, lbl_diff = y_pairing.different_label(lbl, rng)
        y_idx = np.where(is_real, y_same, y_diff)
        label_y = np.where(is_real, lbl, lbl_diff)
        yield {
            "x": x_images[idx],
            "y": y_images[y_idx],
            "is_real": is_real.astype(np.float32),
            "label_x": lbl,
            "label_y": label_y.astype(lbl.dtype),
        }
