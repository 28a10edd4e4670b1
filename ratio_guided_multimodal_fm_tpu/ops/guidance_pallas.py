"""Pallas TPU kernel: fused MC-guidance weights + velocity aggregation.

One kernel computes, entirely in VMEM, what the reference does with ~15
separate torch ops plus a [B, N_mc, C, H, W] temporary
(flow_utils.py:273-341):

    log p_t(x_t|x1ⁱ)p_t(y_t|y1ⁱ)  →  max-stabilized p  →  Z̄, p̄  →
    normalized importance weights w  →  g = (W@X1 − Σw·x_t)/σ

Layout: the MC sample matrices X1 [N, Dx], Y1 [N, Dy] stay resident in VMEM
across the batch-tile grid (constant index_map); each grid step processes a
TILE_B slice of the batch. All cross terms hit the MXU via jnp.dot with f32
accumulation; the stabilized exp/weight math runs on the VPU in f32.

Per the TPU guide: last dims must be 128-aligned (Dx=1024, Dy=3072 for the
32×32 configs both are), N a multiple of 128, and the batch tile a multiple
of 8. `fused_guidance_pallas` pads B and N as needed; padding rows of X1/Y1
get ratio 0 so they contribute nothing to Z̄/W (p̄ uses the true N in the
divisor via a scalar input).

Falls back to the pure-JAX path (sample/guided.py:mc_feng_guidance) on
non-TPU backends or unaligned feature dims.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

EPS_T = 1e-3


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def pallas_available() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def _kernel(scalars_ref, xt_ref, yt_ref, x1_ref, y1_ref, r_ref,
            gx_ref, gy_ref):
    """scalars = [t, inv_n] (SMEM); one grid step = one batch tile."""
    t = scalars_ref[0]
    inv_n = scalars_ref[1]
    sigma = 1.0 - t + EPS_T
    inv_s2 = 1.0 / (sigma * sigma)

    xt = xt_ref[:]                       # [TB, Dx] f32
    yt = yt_ref[:]                       # [TB, Dy]
    X1 = x1_ref[:]                       # [N, Dx]
    Y1 = y1_ref[:]                       # [N, Dy]
    r = r_ref[:]                         # [1, N]  (0 in padding columns)

    # HIGHEST precision: the MXU lowers f32 matmuls to bf16 passes by
    # default, which corrupts the stabilized weight math (same pitfall as
    # the XLA path — see sample/guided.py).
    PREC = jax.lax.Precision.HIGHEST
    cross = (jnp.dot(xt, X1.T, preferred_element_type=jnp.float32,
                     precision=PREC)
             + jnp.dot(yt, Y1.T, preferred_element_type=jnp.float32,
                       precision=PREC))                          # [TB,N]
    xt2 = jnp.sum(xt * xt, axis=1, keepdims=True)
    yt2 = jnp.sum(yt * yt, axis=1, keepdims=True)
    X12 = jnp.sum(X1 * X1, axis=1)[None, :]
    Y12 = jnp.sum(Y1 * Y1, axis=1)[None, :]

    sq = xt2 + yt2 - 2.0 * t * cross + (t * t) * (X12 + Y12)
    log_p = -0.5 * sq * inv_s2                                   # [TB,N]
    # padding columns (r==0) must not win the row max: push them to -inf-ish
    valid = r > 0.0
    log_p = jnp.where(valid, log_p, -1e30)
    m = jnp.max(log_p, axis=1, keepdims=True)
    p = jnp.where(valid, jnp.exp(log_p - m), 0.0)

    p_bar = jnp.sum(p, axis=1, keepdims=True) * inv_n + 1e-10
    z_bar = jnp.sum(r * p, axis=1, keepdims=True) * inv_n + 1e-10
    w = (r / z_bar) * (p / p_bar)
    wsum = jnp.sum(w, axis=1, keepdims=True)
    w = w / (wsum + 1e-10)
    w_total = jnp.sum(w, axis=1, keepdims=True)

    inv_sigma = 1.0 / sigma
    gx_ref[:] = (jnp.dot(w, X1, preferred_element_type=jnp.float32,
                         precision=PREC)
                 - w_total * xt) * inv_sigma
    gy_ref[:] = (jnp.dot(w, Y1, preferred_element_type=jnp.float32,
                         precision=PREC)
                 - w_total * yt) * inv_sigma


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_guidance_pallas(
    x_t: jax.Array,      # [B, ...]
    y_t: jax.Array,
    mc_x1: jax.Array,    # [N, ...]
    mc_y1: jax.Array,
    mc_ratios: jax.Array,  # [N]
    t: jax.Array,        # scalar
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Fused guidance term (g_x, g_y); semantics == mc_feng_guidance."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B = x_t.shape[0]
    N = mc_x1.shape[0]
    xt = x_t.reshape(B, -1).astype(jnp.float32)
    yt = y_t.reshape(B, -1).astype(jnp.float32)
    X1 = mc_x1.reshape(N, -1).astype(jnp.float32)
    Y1 = mc_y1.reshape(N, -1).astype(jnp.float32)
    Dx0, Dy0 = xt.shape[1], yt.shape[1]
    # 128-align the feature (lane) dims; zero padding is exact (contributes
    # nothing to the dot products or squared norms).
    Dx, Dy = _round_up(Dx0, 128), _round_up(Dy0, 128)
    if Dx != Dx0:
        xt = jnp.pad(xt, ((0, 0), (0, Dx - Dx0)))
        X1 = jnp.pad(X1, ((0, 0), (0, Dx - Dx0)))
    if Dy != Dy0:
        yt = jnp.pad(yt, ((0, 0), (0, Dy - Dy0)))
        Y1 = jnp.pad(Y1, ((0, 0), (0, Dy - Dy0)))

    TILE_B = 64
    Bp = _round_up(B, TILE_B)
    Np = _round_up(N, 128)
    # VMEM fit gate: X1+Y1 resident + per-tile buffers (+double buffering
    # across grid steps when grid > 1) must stay under the v5e 16MiB budget.
    n_grid = Bp // TILE_B
    dbuf = 2 if n_grid > 1 else 1
    resident = dbuf * 4 * Np * (Dx + Dy)
    tiles = 4 * TILE_B * (Dx + Dy) * 2 * dbuf + 4 * TILE_B * Np * 3
    if resident + tiles > 12 * 1024 * 1024:
        raise ValueError(
            f"fused_guidance_pallas: shapes N={N} Dx={Dx} Dy={Dy} exceed "
            "VMEM budget; use mc_feng_guidance (XLA) instead")
    if Bp != B:
        xt = jnp.pad(xt, ((0, Bp - B), (0, 0)))
        yt = jnp.pad(yt, ((0, Bp - B), (0, 0)))
    r = mc_ratios.astype(jnp.float32)
    if Np != N:
        X1 = jnp.pad(X1, ((0, Np - N), (0, 0)))
        Y1 = jnp.pad(Y1, ((0, Np - N), (0, 0)))
        r = jnp.pad(r, (0, Np - N))
    r2d = r[None, :]

    scalars = jnp.array([t, 1.0 / N], jnp.float32)

    grid = (Bp // TILE_B,)
    gx, gy = pl.pallas_call(
        _kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((TILE_B, Dx), lambda i, s: (i, 0)),
                pl.BlockSpec((TILE_B, Dy), lambda i, s: (i, 0)),
                pl.BlockSpec((Np, Dx), lambda i, s: (0, 0)),
                pl.BlockSpec((Np, Dy), lambda i, s: (0, 0)),
                pl.BlockSpec((1, Np), lambda i, s: (0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((TILE_B, Dx), lambda i, s: (i, 0)),
                pl.BlockSpec((TILE_B, Dy), lambda i, s: (i, 0)),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((Bp, Dx), jnp.float32),
            jax.ShapeDtypeStruct((Bp, Dy), jnp.float32),
        ],
        interpret=interpret,
    )(scalars, xt, yt, X1, Y1, r2d)

    gx = gx[:B, :Dx0].reshape(x_t.shape)
    gy = gy[:B, :Dy0].reshape(y_t.shape)
    return gx, gy
