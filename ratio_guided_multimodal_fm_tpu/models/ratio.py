"""Density-ratio estimators r̂(x,y) = q(x,y)/p_ind(x,y)  (NHWC, Flax Linen).

Capability parity:
* `FlexibleRatioEstimator` — twin GroupNorm conv encoders + score MLP
  (ref ratio_flexible.py:69-154 / ratio_estimator.py:96-191;
  MNIST config measured 943,745 params).
* `RatioEstimatorMNISTSVHN` — asymmetric BatchNorm encoders + deeper score
  MLP (ref ratio_flexible.py:305-385; measured 3,327,617 params).

Score is terminal-time only (t=1), not time-conditioned, matching the
reference (ratio_estimator.py:100). `log_ratio` follows the estimator's
training loss:
  disc:   log r̂ = logsigmoid(T) − logsigmoid(−T)  ≡ T  (exact identity; the
          reference computes the two logsigmoids explicitly, we use T)
  rulsif: log r̂ = log(softplus(T) + 1e-8)
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


def log_ratio_from_scores(scores: jax.Array, loss_type: str) -> jax.Array:
    """Map raw scores T(x,y) to log r̂(x,y) (ref ratio_flexible.py:135-154)."""
    if loss_type == "disc":
        # logsigmoid(T) - logsigmoid(-T) == T exactly.
        return scores
    elif loss_type == "rulsif":
        return jnp.log(nn.softplus(scores) + 1e-8)
    raise ValueError(f"Unknown loss_type: {loss_type}")


class _GNEncoder(nn.Module):
    """Conv+GroupNorm+SiLU x4 with maxpools, global avg pool, fc
    (ref ratio_flexible.py:13-66)."""

    feature_dim: int = 256
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    norm_eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        pool = lambda h: nn.max_pool(h, (2, 2), strides=(2, 2))
        gn = lambda n: nn.GroupNorm(num_groups=8, name=n,
                                    epsilon=self.norm_eps, **kw)
        x = pool(nn.silu(gn("gn1")(nn.Conv(32, (3, 3), padding=1, name="conv1", **kw)(x))))
        x = pool(nn.silu(gn("gn2")(nn.Conv(64, (3, 3), padding=1, name="conv2", **kw)(x))))
        x = pool(nn.silu(gn("gn3")(nn.Conv(128, (3, 3), padding=1, name="conv3", **kw)(x))))
        x = nn.silu(gn("gn4")(nn.Conv(128, (3, 3), padding=1, name="conv4", **kw)(x)))
        x = jnp.mean(x, axis=(1, 2))  # adaptive avg pool (1,1)
        return nn.Dense(self.feature_dim, name="fc", **kw)(x)


class _ScoreMLP(nn.Module):
    """[2F → H → H/2 → 1] with LayerNorm+SiLU+Dropout
    (ref ratio_flexible.py:104-114)."""

    hidden_dim: int = 512
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    norm_eps: float = 1e-6

    @nn.compact
    def __call__(self, z, *, deterministic: bool = True):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        ln_kw = dict(epsilon=self.norm_eps, **kw)
        z = nn.Dense(self.hidden_dim, name="fc1", **kw)(z)
        z = nn.LayerNorm(name="ln1", **ln_kw)(z)
        z = nn.silu(z)
        z = nn.Dropout(0.1, deterministic=deterministic)(z)
        z = nn.Dense(self.hidden_dim // 2, name="fc2", **kw)(z)
        z = nn.LayerNorm(name="ln2", **ln_kw)(z)
        z = nn.silu(z)
        z = nn.Dropout(0.1, deterministic=deterministic)(z)
        return nn.Dense(1, name="fc3", **kw)(z)


class FlexibleRatioEstimator(nn.Module):
    """Two-stream ratio estimator for same- or cross-channel modalities."""

    x_channels: int = 1
    y_channels: int = 1
    feature_dim: int = 256
    hidden_dim: int = 512
    loss_type: str = "disc"
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    # 1e-6 = flax convention (default); 1e-5 matches torch exactly for
    # imported reference checkpoints (interop/torch_import.py).
    norm_eps: float = 1e-6

    @nn.compact
    def __call__(self, x, y, *, deterministic: bool = True):
        """Returns scores T(x,y): [B]."""
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype,
                  norm_eps=self.norm_eps)
        fx = _GNEncoder(self.feature_dim, name="encoder_x", **kw)(x.astype(self.dtype))
        fy = _GNEncoder(self.feature_dim, name="encoder_y", **kw)(y.astype(self.dtype))
        z = jnp.concatenate([fx, fy], axis=-1)
        s = _ScoreMLP(self.hidden_dim, name="score_net", **kw)(z, deterministic=deterministic)
        return s.squeeze(-1)

    def log_ratio(self, x, y, *, deterministic: bool = True):
        return log_ratio_from_scores(self(x, y, deterministic=deterministic), self.loss_type)


def RatioEstimatorMNIST(loss_type: str = "disc", **kw) -> FlexibleRatioEstimator:
    """MNIST-transform ratio net, 1x28x28 both streams (943,745 params)."""
    return FlexibleRatioEstimator(x_channels=1, y_channels=1, feature_dim=256,
                                  hidden_dim=512, loss_type=loss_type, **kw)


# Alias matching the reference's exp-1 class name (ratio_estimator.py:96).
RatioEstimator = RatioEstimatorMNIST


class _MNISTEncoderBN(nn.Module):
    """Light BatchNorm encoder for 32x32 grayscale (ref ratio_flexible.py:185-232)."""

    feature_dim: int = 256
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        bn = lambda n: nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                    name=n, **kw)
        pool = lambda h: nn.max_pool(h, (2, 2), strides=(2, 2))
        x = pool(nn.silu(bn("bn1")(nn.Conv(32, (3, 3), padding=1, name="conv1", **kw)(x))))
        x = pool(nn.silu(bn("bn2")(nn.Conv(64, (3, 3), padding=1, name="conv2", **kw)(x))))
        x = pool(nn.silu(bn("bn3")(nn.Conv(128, (3, 3), padding=1, name="conv3", **kw)(x))))
        x = nn.silu(bn("bn4")(nn.Conv(128, (3, 3), padding=1, name="conv4", **kw)(x)))
        x = jnp.mean(x, axis=(1, 2))
        return nn.Dense(self.feature_dim, name="fc", **kw)(x)


class _SVHNEncoderBN(nn.Module):
    """VGG-ish double-conv BatchNorm encoder 32->2 px (ref ratio_flexible.py:235-302)."""

    feature_dim: int = 256
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        bn = lambda n: nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                    name=n, **kw)
        pool = lambda h: nn.max_pool(h, (2, 2), strides=(2, 2))
        for i, ch in enumerate([64, 128, 256, 256], start=1):
            x = nn.silu(bn(f"bn{i}a")(nn.Conv(ch, (3, 3), padding=1, name=f"conv{i}a", **kw)(x)))
            x = nn.silu(bn(f"bn{i}b")(nn.Conv(ch, (3, 3), padding=1, name=f"conv{i}b", **kw)(x)))
            x = pool(x)
        x = jnp.mean(x, axis=(1, 2))
        return nn.Dense(self.feature_dim, name="fc", **kw)(x)


class _DeepScoreMLP(nn.Module):
    """[2F → H → H → H/2 → 1] score net (ref ratio_flexible.py:332-345)."""

    hidden_dim: int = 512
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    norm_eps: float = 1e-6

    @nn.compact
    def __call__(self, z, *, deterministic: bool = True):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        ln_kw = dict(epsilon=self.norm_eps, **kw)
        z = nn.Dense(self.hidden_dim, name="fc1", **kw)(z)
        z = nn.silu(nn.LayerNorm(name="ln1", **ln_kw)(z))
        z = nn.Dropout(0.1, deterministic=deterministic)(z)
        z = nn.Dense(self.hidden_dim, name="fc2", **kw)(z)
        z = nn.silu(nn.LayerNorm(name="ln2", **ln_kw)(z))
        z = nn.Dropout(0.1, deterministic=deterministic)(z)
        z = nn.Dense(self.hidden_dim // 2, name="fc3", **kw)(z)
        z = nn.silu(nn.LayerNorm(name="ln3", **ln_kw)(z))
        return nn.Dense(1, name="fc4", **kw)(z)


class RatioEstimatorMNISTSVHN(nn.Module):
    """Asymmetric-encoder ratio net for MNIST(1x32x32)↔SVHN(3x32x32) pairs.

    Uses BatchNorm encoders; callers must pass `train=True` and handle the
    mutable 'batch_stats' collection during training.
    """

    feature_dim: int = 256
    hidden_dim: int = 512
    loss_type: str = "disc"
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    # Only the score-net LayerNorms use this (BatchNorm eps is 1e-5 in
    # both frameworks already); 1e-5 matches torch exactly.
    norm_eps: float = 1e-6

    @nn.compact
    def __call__(self, x, y, *, train: bool = False, deterministic: bool = True):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        fm = _MNISTEncoderBN(self.feature_dim, name="encoder_mnist", **kw)(
            x.astype(self.dtype), train=train)
        fs = _SVHNEncoderBN(self.feature_dim, name="encoder_svhn", **kw)(
            y.astype(self.dtype), train=train)
        z = jnp.concatenate([fm, fs], axis=-1)
        s = _DeepScoreMLP(self.hidden_dim, name="score_net",
                          norm_eps=self.norm_eps, **kw)(
            z, deterministic=deterministic)
        return s.squeeze(-1)

    def log_ratio(self, x, y, *, train: bool = False, deterministic: bool = True):
        return log_ratio_from_scores(
            self(x, y, train=train, deterministic=deterministic), self.loss_type)
