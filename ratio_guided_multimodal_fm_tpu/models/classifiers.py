"""Evaluation classifiers (NHWC, Flax Linen).

Parity with ref classifier.py (MNISTClassifier, 421,642 params) and
svhn_classifier.py (SVHNClassifier 2,341,514; MNISTClassifier32 581,450).
Used only for the coherence metric P(label(x)==label(y)).
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn


class MNISTClassifier(nn.Module):
    """2-conv CNN for 1x28x28 (ref classifier.py:9-52)."""

    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        pool = lambda h: nn.max_pool(h, (2, 2), strides=(2, 2))
        x = pool(nn.relu(nn.Conv(32, (3, 3), padding=1, name="conv1", **kw)(x)))
        x = pool(nn.relu(nn.Conv(64, (3, 3), padding=1, name="conv2", **kw)(x)))
        x = x.reshape(x.shape[0], -1)
        x = nn.relu(nn.Dense(128, name="fc1", **kw)(x))
        x = nn.Dropout(0.25, deterministic=deterministic)(x)
        return nn.Dense(10, name="fc2", **kw)(x)


class MNISTClassifier32(nn.Module):
    """3-conv CNN for 1x32x32 (ref svhn_classifier.py:74-116)."""

    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        pool = lambda h: nn.max_pool(h, (2, 2), strides=(2, 2))
        x = pool(nn.relu(nn.Conv(32, (3, 3), padding=1, name="conv1", **kw)(x)))
        x = pool(nn.relu(nn.Conv(64, (3, 3), padding=1, name="conv2", **kw)(x)))
        x = nn.relu(nn.Conv(64, (3, 3), padding=1, name="conv3", **kw)(x))
        x = x.reshape(x.shape[0], -1)
        x = nn.relu(nn.Dense(128, name="fc1", **kw)(x))
        x = nn.Dropout(0.25, deterministic=deterministic)(x)
        return nn.Dense(10, name="fc2", **kw)(x)


class SVHNClassifier(nn.Module):
    """4-conv BatchNorm CNN for 3x32x32, two maxpools 32->8
    (ref svhn_classifier.py:11-71)."""

    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False, deterministic: bool = True):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        bn = lambda n: nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                    name=n, **kw)
        pool = lambda h: nn.max_pool(h, (2, 2), strides=(2, 2))
        x = pool(nn.relu(bn("bn1")(nn.Conv(32, (3, 3), padding=1, name="conv1", **kw)(x))))
        x = pool(nn.relu(bn("bn2")(nn.Conv(64, (3, 3), padding=1, name="conv2", **kw)(x))))
        x = nn.relu(bn("bn3")(nn.Conv(128, (3, 3), padding=1, name="conv3", **kw)(x)))
        x = nn.relu(bn("bn4")(nn.Conv(128, (3, 3), padding=1, name="conv4", **kw)(x)))
        x = x.reshape(x.shape[0], -1)
        x = nn.relu(nn.Dense(256, name="fc1", **kw)(x))
        x = nn.Dropout(0.3, deterministic=deterministic)(x)
        return nn.Dense(10, name="fc2", **kw)(x)


class Classifier64(nn.Module):
    """3-conv CNN for RGB 64x64 — evaluation classifier for the
    natural-image stretch config (BASELINE config #5; no reference
    equivalent — the reference tops out at 32px)."""

    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        pool = lambda h: nn.max_pool(h, (2, 2), strides=(2, 2))  # noqa: E731
        x = pool(nn.relu(nn.Conv(32, (3, 3), padding=1, name="conv1", **kw)(x)))
        x = pool(nn.relu(nn.Conv(64, (3, 3), padding=1, name="conv2", **kw)(x)))
        x = pool(nn.relu(nn.Conv(64, (3, 3), padding=1, name="conv3", **kw)(x)))
        x = x.reshape(x.shape[0], -1)      # 8*8*64
        x = nn.relu(nn.Dense(128, name="fc1", **kw)(x))
        x = nn.Dropout(0.25, deterministic=deterministic)(x)
        return nn.Dense(10, name="fc2", **kw)(x)
