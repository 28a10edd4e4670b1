"""Original encoder-decoder flow-matching model ("--model original").

Capability parity with ref flow_matching.py:127-173 (FlowMatchingModel,
measured 9,104,513 params): sinusoidal time embedding (sin-first variant),
4-conv encoder to a 256-d feature, MLP+deconv decoder back to a 28x28
velocity field. NHWC layout.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ratio_guided_multimodal_fm_tpu.models.layers import sinusoidal_embedding


class _Encoder(nn.Module):
    """Conv encoder 28->14->7 (ref flow_matching.py:34-72)."""

    feature_dim: int = 256
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    norm_eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        gn = lambda c, n: nn.GroupNorm(num_groups=8, name=n,
                                       epsilon=self.norm_eps, **kw)
        x = nn.silu(gn(32, "gn1")(nn.Conv(32, (3, 3), padding=1, name="conv1", **kw)(x)))
        x = nn.silu(gn(64, "gn2")(nn.Conv(64, (3, 3), (2, 2), padding=1, name="conv2", **kw)(x)))
        x = nn.silu(gn(128, "gn3")(nn.Conv(128, (3, 3), (2, 2), padding=1, name="conv3", **kw)(x)))
        x = nn.silu(gn(256, "gn4")(nn.Conv(256, (3, 3), padding=1, name="conv4", **kw)(x)))
        x = x.reshape(x.shape[0], -1)  # [B, 7*7*256]
        return nn.Dense(self.feature_dim, name="fc", **kw)(x)


class _Decoder(nn.Module):
    """MLP + deconv decoder 7->14->28 (ref flow_matching.py:75-124)."""

    out_channels: int = 1
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    norm_eps: float = 1e-6

    @nn.compact
    def __call__(self, features, t_emb):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        gn = lambda n: nn.GroupNorm(num_groups=8, name=n,
                                    epsilon=self.norm_eps, **kw)
        x = jnp.concatenate([features, t_emb], axis=-1)
        x = nn.Dense(256 * 7 * 7, name="fc1", **kw)(x)
        x = x.reshape(x.shape[0], 7, 7, 256)
        x = nn.silu(gn("gn1")(nn.ConvTranspose(128, (4, 4), (2, 2), padding="SAME",
                                               name="deconv1", **kw)(x)))
        x = nn.silu(gn("gn2")(nn.ConvTranspose(64, (4, 4), (2, 2), padding="SAME",
                                               name="deconv2", **kw)(x)))
        x = nn.silu(gn("gn3")(nn.Conv(32, (3, 3), padding=1, name="conv3", **kw)(x)))
        return nn.Conv(self.out_channels, (3, 3), padding=1, name="conv_out", **kw)(x)


class FlowMatchingModel(nn.Module):
    """Encoder-decoder velocity net v = f(x_t, t) for 1x28x28 (NHWC)."""

    img_channels: int = 1
    feature_dim: int = 256
    time_emb_dim: int = 128
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    # 1e-6 = flax convention (default); 1e-5 matches torch exactly for
    # imported reference checkpoints (interop/torch_import.py).
    norm_eps: float = 1e-6

    @nn.compact
    def __call__(self, x: jax.Array, t: jax.Array, *, deterministic: bool = True):
        t_emb = sinusoidal_embedding(t, self.time_emb_dim).astype(self.dtype)
        feats = _Encoder(self.feature_dim, self.dtype, self.param_dtype,
                         self.norm_eps, name="encoder")(x.astype(self.dtype))
        return _Decoder(self.img_channels, self.dtype, self.param_dtype,
                        self.norm_eps, name="decoder")(feats, t_emb)
