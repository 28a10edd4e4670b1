"""Modality transforms for the MNIST-transform experiment, as pure array ops.

The reference's forward transforms live in the MISSING src/data/mnist_dataset.py
module (SURVEY §2.9); their inverses are defined in evaluate.py:30-53. Names
and inverse semantics match: inverse(rotate90) = +90° CCW (torchvision
TF.rotate positive = counter-clockwise), so forward rotate90 = 90° clockwise.

All functions operate on NHWC float arrays in [-1,1] and are trivially
jittable (np or jnp in, same out).
"""
from __future__ import annotations

TRANSFORM_NAMES = ("rotate90", "rotate180", "rotate270", "invert",
                   "flip_h", "flip_v", "none")


def _xp(imgs):
    import jax.numpy as jnp
    import numpy as np

    return jnp if not isinstance(imgs, np.ndarray) else np


def apply_transform(name, imgs):
    """Forward transform y = T(x). imgs: [..., H, W, C]."""
    xp = _xp(imgs)
    h_ax, w_ax = imgs.ndim - 3, imgs.ndim - 2
    if name == "rotate90":      # 90° clockwise
        return xp.rot90(imgs, k=-1, axes=(h_ax, w_ax))
    if name == "rotate180":
        return xp.rot90(imgs, k=2, axes=(h_ax, w_ax))
    if name == "rotate270":     # 270° clockwise = 90° CCW
        return xp.rot90(imgs, k=1, axes=(h_ax, w_ax))
    if name == "invert":        # [-1,1] negate (ref evaluate.py:47)
        return -imgs
    if name == "flip_h":
        return xp.flip(imgs, axis=w_ax)
    if name == "flip_v":
        return xp.flip(imgs, axis=h_ax)
    return imgs                 # 'none'/unknown → identity (ref evaluate.py:53)


def inverse_transform(name, imgs):
    """Inverse map used before classifying y (ref evaluate.py:30-53)."""
    inverse_of = {
        "rotate90": "rotate270",
        "rotate270": "rotate90",
        "rotate180": "rotate180",
        "invert": "invert",
        "flip_h": "flip_h",
        "flip_v": "flip_v",
    }
    return apply_transform(inverse_of.get(name, "none"), imgs)
