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
import os

import jax
import jax.numpy as jnp
from flax import linen as nn

# GroupNorm implementation selector. Profiling (docs/results_r3/
# profile_B512.json) showed GN statistics + normalize passes dominate the
# guided sampler's device time (858ms + 523ms vs 69ms for ALL convs in the
# 1.56s main ODE), so a fused single-pass Pallas kernel was built
# (ops/groupnorm_pallas.py) and raced — and LOST: inside the real U-Net it
# is 3.3× slower than the XLA path (svhn ODE 3.91s vs 1.17s,
# docs/results_r3/gn_experiment.json), because pallas_call is a fusion
# barrier (conv outputs must round-trip HBM instead of fusing into the
# stats pass) and the per-sample grid pipelines poorly at these tile
# sizes. Pay-or-retire verdict: RETIRED from the default path, kept as an
# opt-in + negative result.
#   'flax' / 'auto' — XLA path (default; equals nn.GroupNorm numerics)
#   'pallas'        — fused kernel (slower on this workload; see above)
#   'interpret'     — kernel in interpret mode (CPU tests)
_GN_IMPL = os.environ.get("RGMF_GN_IMPL", "auto")


def set_gn_impl(impl: str) -> None:
    global _GN_IMPL
    if impl not in ("flax", "pallas", "auto", "interpret"):
        raise ValueError(impl)
    _GN_IMPL = impl


def _use_pallas_gn() -> bool:
    return _GN_IMPL in ("pallas", "interpret")


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


def group_norm(ch: int, *, dtype=jnp.float32, param_dtype=jnp.float32,
               epsilon: float = 1e-6) -> nn.GroupNorm:
    """GroupNorm(min(8, ch)) as used throughout the reference U-Nets.

    epsilon: flax convention 1e-6 (the framework default, every round-1..3
    artifact was measured with it); pass 1e-5 to match torch's nn.GroupNorm
    exactly (bit-matching imported reference checkpoints — interop/)."""
    return nn.GroupNorm(num_groups=min(8, ch), dtype=dtype,
                        param_dtype=param_dtype, epsilon=epsilon)


class FusedGroupNorm(nn.Module):
    """GroupNorm(+SiLU) that may run the fused Pallas kernel on TPU.

    Parameter structure ('scale'/'bias' of shape [C]) and numerics (f32
    statistics, fast variance, eps=1e-6) are identical to nn.GroupNorm, so
    checkpoints are interchangeable — call sites pass an explicit `name`
    to preserve the legacy nn.GroupNorm auto-names (GroupNorm_0, ...).
    Equivalence is asserted by tests/test_fused_groupnorm.py.
    """

    num_groups: int
    fuse_silu: bool = False
    epsilon: float = 1e-6
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        C = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (C,),
                           self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros, (C,),
                          self.param_dtype)
        if (self.fuse_silu and x.ndim == 4 and C % self.num_groups == 0
                and _use_pallas_gn() and self.epsilon == 1e-6):
            # the Pallas kernel hardcodes eps=1e-6; non-default epsilons
            # (e.g. the torch-exact 1e-5 used by interop tests) take the
            # XLA path below rather than silently changing numerics
            from ratio_guided_multimodal_fm_tpu.ops.groupnorm_pallas import (
                group_norm_silu,
            )

            return group_norm_silu(x.astype(self.dtype), scale, bias,
                                   self.num_groups,
                                   interpret=_GN_IMPL == "interpret")

        # XLA path, flax-equivalent: stats in f32 (flax promotes), fast
        # variance E[x²]−E[x]², scale/bias affine, optional SiLU.
        g = self.num_groups
        xf = x.astype(jnp.float32)
        xg = xf.reshape(x.shape[0], -1, g, C // g)
        mean = jnp.mean(xg, axis=(1, 3), keepdims=True)
        var = jnp.mean(xg * xg, axis=(1, 3), keepdims=True) - mean * mean
        y = (xg - mean) * jax.lax.rsqrt(var + self.epsilon)
        y = y.reshape(x.shape)
        y = y * scale.astype(jnp.float32) + bias.astype(jnp.float32)
        y = y.astype(self.dtype)
        return nn.silu(y) if self.fuse_silu else y


def gn_silu(ch: int, *, dtype=jnp.float32, param_dtype=jnp.float32,
            name: str, epsilon: float = 1e-6) -> FusedGroupNorm:
    """GroupNorm(min(8,ch)) followed by SiLU, fused where profitable.
    `name` is required so the param path matches the legacy nn.GroupNorm
    auto-name at each call site. epsilon: see group_norm."""
    return FusedGroupNorm(num_groups=min(8, ch), dtype=dtype,
                          param_dtype=param_dtype, fuse_silu=True,
                          name=name, epsilon=epsilon)


class _SplitGNSiLU(nn.Module):
    """GroupNorm+SiLU over the VIRTUAL concat of two NHWC tensors without
    materializing it: group statistics are composed from per-part channel
    sums (exact — a group's sum is the sum of its channels wherever they
    live), then each part is normalized with its channel slice of the
    group stats. Params ('scale'/'bias' over the full concat C) match
    nn.GroupNorm on the concatenated input."""

    num_groups: int
    epsilon: float = 1e-6
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, a: jax.Array, b: jax.Array):
        Ca, Cb = a.shape[-1], b.shape[-1]
        C = Ca + Cb
        g = self.num_groups
        cg = C // g
        scale = self.param("scale", nn.initializers.ones, (C,),
                           self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros, (C,),
                          self.param_dtype)
        B = a.shape[0]
        n_sp = a.shape[1] * a.shape[2]
        af, bf = a.astype(jnp.float32), b.astype(jnp.float32)
        s_c = jnp.concatenate([jnp.sum(af, axis=(1, 2)),
                               jnp.sum(bf, axis=(1, 2))], axis=-1)  # [B,C]
        q_c = jnp.concatenate([jnp.sum(af * af, axis=(1, 2)),
                               jnp.sum(bf * bf, axis=(1, 2))], axis=-1)
        denom = n_sp * cg
        s_g = jnp.sum(s_c.reshape(B, g, cg), axis=-1)
        q_g = jnp.sum(q_c.reshape(B, g, cg), axis=-1)
        mean_g = s_g / denom
        var_g = q_g / denom - mean_g * mean_g
        inv_g = jax.lax.rsqrt(var_g + self.epsilon)
        mean_c = jnp.repeat(mean_g, cg, axis=-1)                    # [B,C]
        inv_c = jnp.repeat(inv_g, cg, axis=-1)

        def norm(part_f, lo, hi, out_dtype):
            y = (part_f - mean_c[:, None, None, lo:hi]) \
                * inv_c[:, None, None, lo:hi]
            y = y * scale[lo:hi].astype(jnp.float32) \
                + bias[lo:hi].astype(jnp.float32)
            y = y.astype(out_dtype)
            return nn.silu(y)

        return norm(af, 0, Ca, self.dtype), norm(bf, Ca, C, self.dtype)


class _SplitConv(nn.Module):
    """Conv over the VIRTUAL concat of two inputs via kernel slicing:
    conv(cat(a, b), W) ≡ conv(a, W[:, :, :Ca]) + conv(b, W[:, :, Ca:]).
    Param structure ('kernel'/'bias') matches nn.Conv on the concat."""

    features: int
    kernel_size: tuple
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, a: jax.Array, b: jax.Array):
        kh, kw = self.kernel_size
        Ca = a.shape[-1]
        cin = Ca + b.shape[-1]
        W = self.param("kernel", nn.linear.default_kernel_init,
                       (kh, kw, cin, self.features), self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros, (self.features,),
                          self.param_dtype)
        Wd = W.astype(self.dtype)
        dn = ("NHWC", "HWIO", "NHWC")
        pad = [(kh // 2, kh // 2), (kw // 2, kw // 2)]
        ya = jax.lax.conv_general_dilated(
            a.astype(self.dtype), Wd[:, :, :Ca, :], (1, 1), pad,
            dimension_numbers=dn)
        yb = jax.lax.conv_general_dilated(
            b.astype(self.dtype), Wd[:, :, Ca:, :], (1, 1), pad,
            dimension_numbers=dn)
        return ya + yb + bias.astype(self.dtype)


class ResBlock(nn.Module):
    """Residual block with time-embedding bias (ref unet_flexible.py:39-85).

    GN→SiLU→conv3x3 → (+ time MLP bias) → GN→SiLU→dropout→conv3x3, 1x1 skip
    when channel counts differ. NHWC.

    `skip_in`: optional second input, treated EXACTLY as if concatenated
    onto x's channels — but never materialized: the GroupNorm statistics
    are composed from per-part channel sums, and conv1/skip-conv apply to
    each part with the corresponding kernel slice (conv(cat(a,b), W) ≡
    conv(a, W[:a]) + conv(b, W[a:])). Parameters are identical to the
    concat formulation, so checkpoints are interchangeable; equivalence is
    asserted by tests/test_split_skip.py. Motivation: the decoder concats
    showed up as large async copy/slice streams in the sampler profile
    (docs/results_r3/profile_B512.json).
    """

    out_channels: int
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    # 1e-6 = flax convention (framework default, all shipped artifacts);
    # 1e-5 matches torch exactly for imported reference checkpoints.
    norm_eps: float = 1e-6

    @nn.compact
    def __call__(self, x: jax.Array, t_emb: jax.Array, *,
                 skip_in: jax.Array | None = None,
                 deterministic: bool = True):
        in_ch = x.shape[-1] + (skip_in.shape[-1] if skip_in is not None
                               else 0)
        if skip_in is None:
            # names GroupNorm_0/_1 preserve the original nn.GroupNorm
            # auto-names so round-1/2 checkpoints load unchanged
            h = gn_silu(in_ch, dtype=self.dtype,
                        param_dtype=self.param_dtype,
                        name="GroupNorm_0", epsilon=self.norm_eps)(x)
            h = nn.Conv(self.out_channels, (3, 3), padding=1,
                        dtype=self.dtype, param_dtype=self.param_dtype,
                        name="conv1")(h)
        else:
            a_n, b_n = _SplitGNSiLU(min(8, in_ch), dtype=self.dtype,
                                    param_dtype=self.param_dtype,
                                    name="GroupNorm_0",
                                    epsilon=self.norm_eps)(x, skip_in)
            h = _SplitConv(self.out_channels, (3, 3), dtype=self.dtype,
                           param_dtype=self.param_dtype,
                           name="conv1")(a_n, b_n)

        t = nn.Dense(self.out_channels, dtype=self.dtype, param_dtype=self.param_dtype,
                     name="time_mlp")(nn.silu(t_emb))
        h = h + t[:, None, None, :]

        h = gn_silu(self.out_channels, dtype=self.dtype,
                    param_dtype=self.param_dtype, name="GroupNorm_1",
                    epsilon=self.norm_eps)(h)
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    param_dtype=self.param_dtype, name="conv2")(h)

        if in_ch != self.out_channels:
            if skip_in is None:
                x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                            param_dtype=self.param_dtype, name="skip")(x)
            else:
                x = _SplitConv(self.out_channels, (1, 1), dtype=self.dtype,
                               param_dtype=self.param_dtype,
                               name="skip")(x, skip_in)
        elif skip_in is not None:
            x = jnp.concatenate([x, skip_in], axis=-1)
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
