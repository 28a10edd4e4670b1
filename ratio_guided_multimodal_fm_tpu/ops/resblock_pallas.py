"""Fused GroupNorm+SiLU+3x3-conv Pallas TPU kernel — the tier-C probe.

docs/results_r3/mfu_roofline.json's tier C (~81% MFU ceiling) ASSUMES
per-ResBlock mega-kernels in which the GN/SiLU passes are free and each
conv reads+writes HBM once. Round 3 measured that composing separate
pallas_call GN kernels with XLA convs is 3.3x SLOWER end-to-end (fusion
barriers, gn_experiment.json) — so tier C stands or falls on whether the
norm and the conv can live in ONE kernel. This module is that experiment
(VERDICT r4 weak #5 / next-step #8): the half-ResBlock unit

    out = conv3x3(silu(GroupNorm(groups)(x))) + bias        (NHWC)

in a single pallas_call: a grid step loads a tile of TB samples once,
computes (sample, group) statistics on-chip (the [C, G] indicator-matmul
trick from ops/groupnorm_pallas.py — group reductions without lane-dim
reshapes), normalizes + SiLU in VMEM, and feeds the activation STRAIGHT
into the convolution as 9 shifted [TB*H*W, C] @ [C, O] MXU matmuls
(3x3 conv = sum of 9 channel-contractions over spatially shifted views;
SAME padding via an in-VMEM zero-pad). One HBM read of x, one HBM write
of out — the exact tier-C memory model.

Measured by scripts/resblock_kernel_bench.py on the v5e; the verdict
(pay or retire, like the round-3 GN experiment) lives in
docs/results_r5/resblock_kernel_bench.json + README.

Semantics parity target: flax `nn.silu(nn.GroupNorm(groups, eps=1e-6)(x))`
followed by `lax.conv_general_dilated(..., 'SAME', NHWC/HWIO)` — the
FlexibleUNet ResBlock's first half (models/unet.py; ref unet_flexible.py
:51-61 GroupNorm(min(8, ch)) + conv).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

EPS = 1e-6


def _kernel(x_ref, scale_ref, bias_ref, m_ref, w_ref, cb_ref, o_ref, *,
            groups: int, H: int, W: int):
    import numpy as np

    x = x_ref[:]                       # [TB, N, C] model dtype
    scale = scale_ref[:]               # [1, C]
    bias = bias_ref[:]
    M = m_ref[:]                       # [C, G] f32 group indicator
    w = w_ref[:]                       # [9, C, O] model dtype
    cb = cb_ref[:]                     # [1, O]
    TB, N, C = x.shape
    O = w.shape[-1]
    cg = C // groups
    denom = np.float32(N * cg)

    # ---- GroupNorm statistics in f32 (one pass over the VMEM tile) ----
    xf = x.astype(jnp.float32)
    s_c = jnp.sum(xf, axis=1)          # [TB, C] sublane-axis reduce
    q_c = jnp.sum(xf * xf, axis=1)
    PREC = jax.lax.Precision.HIGHEST
    s_g = jnp.dot(s_c, M, precision=PREC)          # [TB, G]
    q_g = jnp.dot(q_c, M, precision=PREC)
    mean_g = s_g / denom
    var_g = q_g / denom - mean_g * mean_g
    inv_g = jax.lax.rsqrt(var_g + EPS)
    mean_c = jnp.dot(mean_g, M.T, precision=PREC)  # [TB, C]
    inv_c = jnp.dot(inv_g, M.T, precision=PREC)

    # ---- normalize + affine + SiLU, still in VMEM ----
    y = (xf - mean_c[:, None, :]) * inv_c[:, None, :]
    y = y * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    y = (y * jax.nn.sigmoid(y)).astype(x.dtype)     # conv in model dtype

    # ---- 3x3 SAME conv as 9 shifted MXU matmuls ----
    y4 = y.reshape(TB, H, W, C)
    ypad = jnp.pad(y4, ((0, 0), (1, 1), (1, 1), (0, 0)))
    acc = jnp.zeros((TB * N, O), jnp.float32)
    for k in range(9):
        di, dj = divmod(k, 3)
        ys = ypad[:, di:di + H, dj:dj + W, :].reshape(TB * N, C)
        acc = acc + jnp.dot(ys, w[k], preferred_element_type=jnp.float32)
    out = acc + cb.astype(jnp.float32)
    o_ref[:] = out.reshape(TB, N, O).astype(x.dtype)


@functools.partial(
    jax.jit, static_argnames=("groups", "tile_b", "interpret"))
def fused_gn_silu_conv(
    x: jax.Array,          # [B, H, W, C] (bf16 or f32)
    gn_scale: jax.Array,   # [C]
    gn_bias: jax.Array,    # [C]
    conv_w: jax.Array,     # [3, 3, C, O] (HWIO, like lax NHWC convs)
    conv_b: jax.Array,     # [O]
    groups: int,
    tile_b: int | None = None,
    interpret: bool = False,
) -> jax.Array:
    """conv3x3(silu(GroupNorm(groups)(x))) + b in one HBM pass. NHWC."""
    from jax.experimental import pallas as pl

    B, H, W, C = x.shape
    if C % groups:
        raise ValueError(f"C={C} not divisible by groups={groups}")
    kh, kw, ci, O = conv_w.shape
    if (kh, kw, ci) != (3, 3, C):
        raise ValueError(f"conv_w must be [3,3,{C},O], got {conv_w.shape}")
    N = H * W
    xr = x.reshape(B, N, C)

    if tile_b is None:
        # x tile + padded f32 working copy + f32 accumulator ≈ 14B/elem;
        # stay ≲4MB per buffer in VMEM
        tile_b = max(1, min(8, (4 * 1024 * 1024) // (N * max(C, O) * 14)
                            or 1))
    Bp = ((B + tile_b - 1) // tile_b) * tile_b
    if Bp != B:
        xr = jnp.pad(xr, ((0, Bp - B), (0, 0), (0, 0)))

    eye = jnp.repeat(jnp.eye(groups, dtype=jnp.float32),
                     C // groups, axis=0)             # [C, G]
    wr = conv_w.reshape(9, C, O).astype(x.dtype)
    out = pl.pallas_call(
        functools.partial(_kernel, groups=groups, H=H, W=W),
        grid=(Bp // tile_b,),
        in_specs=[
            pl.BlockSpec((tile_b, N, C), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, C), lambda i: (0, 0)),
            pl.BlockSpec((1, C), lambda i: (0, 0)),
            pl.BlockSpec((C, groups), lambda i: (0, 0)),
            pl.BlockSpec((9, C, O), lambda i: (0, 0, 0)),
            pl.BlockSpec((1, O), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((tile_b, N, O), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((Bp, N, O), x.dtype),
        interpret=interpret,
    )(xr, gn_scale.reshape(1, C), gn_bias.reshape(1, C), eye, wr,
      conv_b.reshape(1, O))
    return out[:B].reshape(B, H, W, O)


def reference_gn_silu_conv(x, gn_scale, gn_bias, conv_w, conv_b,
                           groups: int) -> jax.Array:
    """XLA reference of the same half-ResBlock (what the U-Net runs)."""
    import flax.linen as nn

    y = nn.GroupNorm(num_groups=groups, epsilon=EPS,
                     use_bias=True, use_scale=True).apply(
        {"params": {"scale": gn_scale, "bias": gn_bias}}, x)
    y = nn.silu(y)
    out = jax.lax.conv_general_dilated(
        y, conv_w.astype(y.dtype), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return out + conv_b.astype(out.dtype)
