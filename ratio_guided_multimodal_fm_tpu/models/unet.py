"""Flexible U-Net velocity networks (NHWC, Flax Linen).

One parameterized module subsumes the reference's three near-duplicate nets
(unet.py UNetMNIST/FlowMatchingUNet, unet_flexible.py FlexibleUNet +
FlowMatchingUNetMNIST/FlowMatchingUNetSVHN); architecture matches the
reference exactly so parameter counts line up with the measured values in
BASELINE.md:

* MNIST  (in=1, ch=32, mult=(1,2)):     901,121 params
* SVHN   (in=3, ch=64, mult=(1,2,2)): 6,074,371 params

Skip-connection bookkeeping mirrors ref unet_flexible.py:157-194: encoder
pushes the post-input-conv feature, every ResBlock output, and every
Downsample output; decoder pops num_res_blocks+1 skips per level.
Output conv is zero-initialized (ref unet_flexible.py:199-201).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ratio_guided_multimodal_fm_tpu.models.layers import (
    Downsample,
    ResBlock,
    Upsample,
    gn_silu,
    timestep_embedding,
)


class FlexibleUNet(nn.Module):
    """U-Net predicting the CFM velocity field v = f(x_t, t).

    Input/output layout is NHWC: x [B, H, W, C], t [B] in [0,1].
    """

    in_channels: int = 1
    img_size: int = 28
    model_channels: int = 32
    channel_mult: Tuple[int, ...] = (1, 2)
    num_res_blocks: int = 2
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    # Feed decoder skips into ResBlocks as a second input instead of
    # materializing jnp.concatenate (identical math and params — see
    # layers._SplitGNSiLU/_SplitConv; the sampler profile showed the
    # decoder concats as large async copy streams). Measured on v5e
    # (docs/results_r3/opt_experiment.json): headline sampler 202 → 222.6
    # samples/s. Default ON; False restores the concat graph.
    split_skip: bool = True
    # Normalization epsilon: 1e-6 = flax convention (framework default,
    # all shipped artifacts); 1e-5 matches torch's nn.GroupNorm exactly —
    # use for bit-matching imported reference checkpoints (interop/).
    norm_eps: float = 1e-6

    @nn.compact
    def __call__(self, x: jax.Array, t: jax.Array, *, deterministic: bool = True):
        mc = self.model_channels
        time_dim = mc * 4

        t_emb = timestep_embedding(t, mc)
        t_emb = nn.Dense(time_dim, dtype=self.dtype, param_dtype=self.param_dtype,
                         name="time_dense1")(t_emb.astype(self.dtype))
        t_emb = nn.silu(t_emb)
        t_emb = nn.Dense(time_dim, dtype=self.dtype, param_dtype=self.param_dtype,
                         name="time_dense2")(t_emb)

        h = nn.Conv(mc, (3, 3), padding=1, dtype=self.dtype,
                    param_dtype=self.param_dtype, name="input_conv")(x.astype(self.dtype))

        # Encoder
        hs = [h]
        blk = 0
        for level, mult in enumerate(self.channel_mult):
            out_ch = mc * mult
            for _ in range(self.num_res_blocks):
                h = ResBlock(out_ch, self.dropout, dtype=self.dtype,
                             param_dtype=self.param_dtype,
                             norm_eps=self.norm_eps,
                             name=f"enc_{blk}")(h, t_emb, deterministic=deterministic)
                hs.append(h)
                blk += 1
            if level < len(self.channel_mult) - 1:
                h = Downsample(dtype=self.dtype, param_dtype=self.param_dtype,
                               name=f"down_{level}")(h)
                hs.append(h)

        # Middle
        h = ResBlock(h.shape[-1], self.dropout, dtype=self.dtype,
                     param_dtype=self.param_dtype, norm_eps=self.norm_eps,
                     name="middle_1")(h, t_emb, deterministic=deterministic)
        h = ResBlock(h.shape[-1], self.dropout, dtype=self.dtype,
                     param_dtype=self.param_dtype, norm_eps=self.norm_eps,
                     name="middle_2")(h, t_emb, deterministic=deterministic)

        # Decoder
        blk = 0
        for rev_idx, level in enumerate(reversed(range(len(self.channel_mult)))):
            out_ch = mc * self.channel_mult[level]
            for _ in range(self.num_res_blocks + 1):
                skip = hs.pop()
                rb = ResBlock(out_ch, self.dropout, dtype=self.dtype,
                              param_dtype=self.param_dtype,
                              norm_eps=self.norm_eps,
                              name=f"dec_{blk}")
                if self.split_skip:
                    h = rb(h, t_emb, skip_in=skip,
                           deterministic=deterministic)
                else:
                    h = rb(jnp.concatenate([h, skip], axis=-1), t_emb,
                           deterministic=deterministic)
                blk += 1
            if level > 0:
                h = Upsample(dtype=self.dtype, param_dtype=self.param_dtype,
                             name=f"up_{rev_idx}")(h)

        h = gn_silu(h.shape[-1], dtype=self.dtype,
                    param_dtype=self.param_dtype, name="GroupNorm_0",
                    epsilon=self.norm_eps)(h)
        h = nn.Conv(self.in_channels, (3, 3), padding=1,
                    kernel_init=nn.initializers.zeros,
                    bias_init=nn.initializers.zeros,
                    dtype=self.dtype, param_dtype=self.param_dtype,
                    name="out_conv")(h)
        return h


def FlowMatchingUNet(**kw) -> FlexibleUNet:
    """Default MNIST-28 FM net (ref unet.py:282-305): ch=32, mult=(1,2)."""
    return FlexibleUNet(in_channels=1, img_size=28, model_channels=32,
                        channel_mult=(1, 2), num_res_blocks=2, dropout=0.1, **kw)


def FlowMatchingUNetMNIST(img_size: int = 28, **kw) -> FlexibleUNet:
    """MNIST FM net, 28 or 32 px (ref unet_flexible.py:266-277)."""
    return FlexibleUNet(in_channels=1, img_size=img_size, model_channels=32,
                        channel_mult=(1, 2), num_res_blocks=2, dropout=0.1, **kw)


def FlowMatchingUNetSVHN(**kw) -> FlexibleUNet:
    """SVHN FM net (ref unet_flexible.py:280-291): in=3, ch=64, mult=(1,2,2)."""
    return FlexibleUNet(in_channels=3, img_size=32, model_channels=64,
                        channel_mult=(1, 2, 2), num_res_blocks=2, dropout=0.1, **kw)


def FlowMatchingUNet64(in_channels: int = 3, **kw) -> FlexibleUNet:
    """64x64 FM net for the CIFAR/CelebA-class stretch config
    (BASELINE.json config #5 — no reference equivalent): ch=96,
    mult=(1,2,2,4) → 64→32→16→8 spatial pyramid."""
    return FlexibleUNet(in_channels=in_channels, img_size=64,
                        model_channels=96, channel_mult=(1, 2, 2, 4),
                        num_res_blocks=2, dropout=0.1, **kw)
