"""PNG pair-grid writers (parity with ref sample.py:33-110 and
sample_mnist_svhn.py:180-244): columns of (x, y) stacked vertically."""
from __future__ import annotations

import os

import numpy as np


def _to_01(img):
    return np.clip((np.asarray(img) + 1.0) / 2.0, 0.0, 1.0)


def _pair_grid(samples_x, samples_y, save_path, title,
               num_cols=8, num_rows=8, row_labels=("x", "y")):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    num_pairs = min(num_cols * num_rows, len(samples_x))
    fig_w = num_cols * 1.2
    fig_h = num_rows * 2 * 1.2 + 0.5
    fig, axes = plt.subplots(num_rows * 2, num_cols, figsize=(fig_w, fig_h))
    axes = np.atleast_2d(axes)

    for idx in range(num_cols * num_rows):
        col = idx % num_cols
        row_x = (idx // num_cols) * 2
        row_y = row_x + 1
        for r in (row_x, row_y):
            axes[r, col].axis("off")
        if idx >= num_pairs:
            continue
        ix = _to_01(samples_x[idx])
        iy = _to_01(samples_y[idx])
        if ix.shape[-1] == 1:
            axes[row_x, col].imshow(ix[..., 0], cmap="gray", vmin=0, vmax=1)
        else:
            axes[row_x, col].imshow(ix)
        if iy.shape[-1] == 1:
            axes[row_y, col].imshow(iy[..., 0], cmap="gray", vmin=0, vmax=1)
        else:
            axes[row_y, col].imshow(iy)

    # Left-edge x/y row labels (ref sample.py:95-101)
    if row_labels:
        for pair_row in range(num_rows):
            for off, lbl in ((0, row_labels[0]), (1, row_labels[1])):
                ax = axes[pair_row * 2 + off, 0]
                ax.set_ylabel(lbl, fontsize=10, rotation=0, labelpad=15,
                              va="center")
                ax.yaxis.set_visible(True)

    fig.suptitle(title, fontsize=12, fontweight="bold")
    plt.tight_layout()
    d = os.path.dirname(save_path)
    if d:
        os.makedirs(d, exist_ok=True)
    plt.savefig(save_path, dpi=150, bbox_inches="tight")
    plt.close(fig)
    print(f"Saved visualization: {save_path}")


def visualize_pairs(samples_x, samples_y, save_path,
                    transform_type="rotate90", num_cols=8, num_rows=8):
    """MNIST-transform pair grid (ref sample.py:33-110). NHWC inputs."""
    _pair_grid(samples_x, samples_y, save_path,
               f"Generated Pairs (x, y) — Transform: {transform_type}",
               num_cols, num_rows)


def visualize_pairs_mnist_svhn(samples_x, samples_y, save_path,
                               num_cols=8, num_rows=4, title=None):
    """Cross-modal pair grid (ref sample_mnist_svhn.py:180-244); `title`
    overrides the MNIST/SVHN default for other modality pairs (e.g.
    config5's objects/faces)."""
    _pair_grid(samples_x, samples_y, save_path,
               title or "Generated Pairs — MNIST (top) / SVHN (bottom)",
               num_cols, num_rows)
