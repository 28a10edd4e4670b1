"""Shared model layers (NHWC, Flax Linen).

Capability parity with the reference's building blocks, re-designed for TPU:
images are NHWC (XLA's native TPU conv layout), GroupNorm/LayerNorm act on
the trailing channel axis, and both sinusoidal time-embedding variants that
appear in the reference are provided:

* `timestep_embedding`  — cos-first, exp(-log(P)·i/half)    (ref unet.py:13-33)
* `sinusoidal_embedding`— sin-first, denominator (half-1)    (ref flow_matching.py:10-31)
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from flax import linen as nn


def timestep_embedding(t: jax.Array, dim: int, max_period: float = 10000.0) -> jax.Array:
    """Sinusoidal embedding, cos-first variant (ref unet_flexible.py:16-36).

    Args:
      t: [B] timesteps in [0,1].
      dim: embedding width.
    Returns: [B, dim].
    """
    half = dim // 2
    freqs = jnp.exp(-math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half)
    args = t.astype(jnp.float32)[:, None] * freqs[None, :]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], axis=-1)
    return emb


def sinusoidal_embedding(t: jax.Array, dim: int) -> jax.Array:
    """Sinusoidal embedding, sin-first variant (ref flow_matching.py:10-31)."""
    half = dim // 2
    scale = math.log(10000.0) / (half - 1)
    freqs = jnp.exp(-scale * jnp.arange(half, dtype=jnp.float32))
    args = t.astype(jnp.float32)[:, None] * freqs[None, :]
    return jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)


def group_norm(ch: int, *, dtype=jnp.float32, param_dtype=jnp.float32) -> nn.GroupNorm:
    """GroupNorm(min(8, ch)) as used throughout the reference U-Nets."""
    return nn.GroupNorm(num_groups=min(8, ch), dtype=dtype, param_dtype=param_dtype)


class ResBlock(nn.Module):
    """Residual block with time-embedding bias (ref unet_flexible.py:39-85).

    GN→SiLU→conv3x3 → (+ time MLP bias) → GN→SiLU→dropout→conv3x3, 1x1 skip
    when channel counts differ. NHWC.
    """

    out_channels: int
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, t_emb: jax.Array, *, deterministic: bool = True):
        in_ch = x.shape[-1]
        h = group_norm(in_ch, dtype=self.dtype, param_dtype=self.param_dtype)(x)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    param_dtype=self.param_dtype, name="conv1")(h)

        t = nn.Dense(self.out_channels, dtype=self.dtype, param_dtype=self.param_dtype,
                     name="time_mlp")(nn.silu(t_emb))
        h = h + t[:, None, None, :]

        h = group_norm(self.out_channels, dtype=self.dtype, param_dtype=self.param_dtype)(h)
        h = nn.silu(h)
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    param_dtype=self.param_dtype, name="conv2")(h)

        if in_ch != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                        param_dtype=self.param_dtype, name="skip")(x)
        return h + x


class Downsample(nn.Module):
    """2x downsample via stride-2 conv (ref unet_flexible.py:88-96)."""

    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array):
        ch = x.shape[-1]
        return nn.Conv(ch, (3, 3), strides=(2, 2), padding=1, dtype=self.dtype,
                       param_dtype=self.param_dtype, name="conv")(x)


class Upsample(nn.Module):
    """2x nearest upsample + conv (ref unet_flexible.py:99-108)."""

    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array):
        b, h, w, c = x.shape
        x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
        return nn.Conv(c, (3, 3), padding=1, dtype=self.dtype,
                       param_dtype=self.param_dtype, name="conv")(x)
