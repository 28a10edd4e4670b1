"""Fused single-pass GroupNorm+SiLU Pallas TPU kernel.

Why this exists (measured, docs/results_r3/profile_B512.json): the guided
sampler's device time is dominated by GroupNorm, not convolution — in the
1.56s main ODE the GN statistics passes (convert_reduce_fusion, 858ms) and
the normalize/SiLU elementwise fusions (523ms) dwarf ALL convolutions
(69ms). XLA cannot fuse a normalization into one pass: the reduce must
finish before the normalize can start, so the activation streams from HBM
at least twice (plus a write), and the observed GN+SiLU bandwidth is only
115-210 GB/s of the v5e's ~819 GB/s.

The kernel exploits what XLA cannot: one sample's activation map fits VMEM
(32·32·64·2B = 128KB), so a grid step loads a tile of TB samples ONCE,
computes per-(sample, group) statistics on-chip, normalizes, applies the
affine + SiLU, and writes bf16 back — exactly one HBM read and one write.

Group reductions avoid lane-dim reshapes (C → [G, C/G] would make the
4-16-wide group the lane axis) by using a [C, G] group-indicator matrix:
channel sums reduce over the sublane (spatial) axis, then fold to groups
via an MXU matmul; per-channel broadcast of the group stats is the
transpose matmul. Statistics run in f32 (matches flax GroupNorm's
promoted-stats behavior, eps=1e-6, E[x²]−E[x]² fast variance).

Semantics = nn.silu(nn.GroupNorm(num_groups)(x)) for NHWC x; parity with
the reference's GroupNorm(min(8, ch)) usage (ref unet_flexible.py:51,61).
Used by models/layers.py group_norm_silu when enabled (RGMF_GN_IMPL).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

EPS = 1e-6


def _kernel(x_ref, scale_ref, bias_ref, m_ref, o_ref, *, groups: int):
    import numpy as np

    x = x_ref[:]                       # [TB, N, C] bf16
    scale = scale_ref[:]               # [1, C]
    bias = bias_ref[:]
    M = m_ref[:]                       # [C, G] f32 group indicator
    TB, N, C = x.shape
    cg = C // groups
    denom = np.float32(N * cg)

    xf = x.astype(jnp.float32)
    s_c = jnp.sum(xf, axis=1)          # [TB, C]  (sublane-axis reduce)
    q_c = jnp.sum(xf * xf, axis=1)     # [TB, C]
    PREC = jax.lax.Precision.HIGHEST
    s_g = jnp.dot(s_c, M, precision=PREC)     # [TB, G]
    q_g = jnp.dot(q_c, M, precision=PREC)
    mean_g = s_g / denom
    var_g = q_g / denom - mean_g * mean_g
    inv_g = jax.lax.rsqrt(var_g + EPS)
    mean_c = jnp.dot(mean_g, M.T, precision=PREC)   # [TB, C] per-channel
    inv_c = jnp.dot(inv_g, M.T, precision=PREC)

    y = (xf - mean_c[:, None, :]) * inv_c[:, None, :]
    y = y * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    o_ref[:] = (y * jax.nn.sigmoid(y)).astype(x.dtype)


@functools.partial(jax.jit,
                   static_argnames=("groups", "tile_b", "interpret"))
def group_norm_silu(
    x: jax.Array,          # [B, H, W, C] (bf16 or f32)
    scale: jax.Array,      # [C]
    bias: jax.Array,       # [C]
    groups: int,
    tile_b: int | None = None,
    interpret: bool = False,
) -> jax.Array:
    """nn.silu(GroupNorm(groups)(x)) in one HBM pass. NHWC only."""
    from jax.experimental import pallas as pl

    B, H, W, C = x.shape
    if C % groups:
        raise ValueError(f"C={C} not divisible by groups={groups}")
    N = H * W
    xr = x.reshape(B, N, C)

    if tile_b is None:
        # input tile + f32 working set ≈ 10 bytes/elem; stay ≲4MB/buffer
        tile_b = max(1, min(8, (4 * 1024 * 1024) // (N * C * 10) or 1))
    Bp = ((B + tile_b - 1) // tile_b) * tile_b
    if Bp != B:
        xr = jnp.pad(xr, ((0, Bp - B), (0, 0), (0, 0)))

    eye = jnp.repeat(jnp.eye(groups, dtype=jnp.float32),
                     C // groups, axis=0)             # [C, G]
    out = pl.pallas_call(
        functools.partial(_kernel, groups=groups),
        grid=(Bp // tile_b,),
        in_specs=[
            pl.BlockSpec((tile_b, N, C), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, C), lambda i: (0, 0)),
            pl.BlockSpec((1, C), lambda i: (0, 0)),
            pl.BlockSpec((C, groups), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((tile_b, N, C), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((Bp, N, C), x.dtype),
        interpret=interpret,
    )(xr, scale.reshape(1, C), bias.reshape(1, C), eye)
    return out[:B].reshape(B, H, W, C)
