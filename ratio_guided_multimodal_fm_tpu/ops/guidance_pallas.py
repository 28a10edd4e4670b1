"""Flash-style Pallas TPU kernel for MC-guidance (mc_feng, Feng et al. Alg 2).

Key identity (see sample/guided.py:mc_feng_guidance for the reference-parity
formulation): the normalized importance weights reduce EXACTLY to a softmax —

    w_i = (r_i/Z̄)(p_i/p̄) / Σ_j (r_j/Z̄)(p_j/p̄) = softmax_i(log r_i + log p_i)

because the Z̄ and p̄ factors cancel under normalization (they exist in the
reference, flow_utils.py:304-319, only to keep the *un*-normalized weights
representable). With log p_i(x_t|x1ⁱ)p_i(y_t|y1ⁱ) a squared distance, the
guidance term

    g = (Σ_i w_i·X1_i − x_t)/σ

is attention with a distance kernel: query (x_t,y_t), keys/values (X1,Y1).
This kernel therefore uses the flash-attention recurrence: tile the MC axis
N, keep a running row-max m, normalizer l = Σe^{s−m}, square-sum q (for the
effective sample size ESS = l²/q), and rescaled accumulators
acc = Σe^{s−m}·X1 — one pass over HBM, nothing of shape [B,N] ever
materializes, and N is bounded by HBM rather than by VMEM (the round-1
kernel kept X1/Y1 fully resident and hit its VMEM gate at N≈256; XLA
materializes several [B,N] intermediates in HBM).

Extra fused outputs per trajectory: l (the softmax normalizer, so the max
weight is exactly 1/l) and ESS — the diagnostics the sampler needs for the
ess_floor collapse mitigation, at zero extra memory passes.

All dots run on the MXU at HIGHEST precision with f32 accumulation (this
JAX build lowers f32 matmuls to bf16 passes by default, which corrupts
stabilized weight math). Lane dims are zero-padded to 128 (exact: padding
contributes nothing to distances); padded N rows carry log r = -1e30 so
their softmax mass is 0.

Reference behavior covered: flow_utils.py:273-341 (weights + velocity mix);
semantics match sample/guided.py:mc_feng_guidance to ~1e-5 (tests).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

EPS_T = 1e-3  # sigma floor, matches ref flow_utils.py:279

NEG_INF = -1e30


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def pallas_available() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def flash_guidance_fits(dx: int, dy: int) -> bool:
    """Whether the flattened pair feature dims fit the kernel's VMEM tiling.

    TN is floored at 128 (lane alignment, see _auto_tiles), so the
    double-buffered X1/Y1 input tiles alone cost 2·128·row_bytes; with the
    minimum batch side (TB=8) the total must stay within ~14MiB of the
    v5e's ~16MiB VMEM. Beyond that (Dx+Dy ≳ 11.7k f32 — e.g. a 64×64
    RGB+gray pair) the kernel cannot be tiled and callers must use the XLA
    path ('auto' mode checks this automatically)."""
    row_bytes = 4 * (_round_up(dx, 128) + _round_up(dy, 128))
    return (2 * 128 + 7 * 8) * row_bytes <= 14 * 1024 * 1024


def _kernel(scalars_ref, xt_ref, yt_ref, x1_ref, y1_ref, lr_ref,
            gx_ref, gy_ref, ess_ref, l_ref,
            accx_ref, accy_ref, m_ref, l_sc, q_sc):
    """Grid = (B tiles, N tiles), N innermost. Flash recurrence over N.

    scalars = [t] (SMEM, prefetched). Scratch persists across the N loop:
    accx/accy [TB, D*], m/l/q [TB, 128] (value broadcast across lanes).
    """
    from jax.experimental import pallas as pl

    j = pl.program_id(1)
    n_j = pl.num_programs(1)

    t = scalars_ref[0]
    sigma = 1.0 - t + EPS_T
    inv_2s2 = 0.5 / (sigma * sigma)

    xt = xt_ref[:]                      # [TB, Dx] f32
    yt = yt_ref[:]                      # [TB, Dy]
    X1 = x1_ref[:]                      # [TN, Dx]
    Y1 = y1_ref[:]                      # [TN, Dy]
    lr = lr_ref[:]                      # [1, TN] log r (NEG_INF in padding)

    @pl.when(j == 0)
    def _init():
        accx_ref[:] = jnp.zeros_like(accx_ref)
        accy_ref[:] = jnp.zeros_like(accy_ref)
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_sc[:] = jnp.zeros_like(l_sc)
        q_sc[:] = jnp.zeros_like(q_sc)

    PREC = jax.lax.Precision.HIGHEST
    cross = (jnp.dot(xt, X1.T, preferred_element_type=jnp.float32,
                     precision=PREC)
             + jnp.dot(yt, Y1.T, preferred_element_type=jnp.float32,
                       precision=PREC))                         # [TB, TN]
    xt2 = jnp.sum(xt * xt, axis=1, keepdims=True)
    yt2 = jnp.sum(yt * yt, axis=1, keepdims=True)
    X12 = jnp.sum(X1 * X1, axis=1)[None, :]
    Y12 = jnp.sum(Y1 * Y1, axis=1)[None, :]
    sq = (xt2 + yt2) - 2.0 * t * cross + (t * t) * (X12 + Y12)
    s = lr - sq * inv_2s2                                       # [TB, TN]

    m_old = m_ref[:, :1]                                        # [TB, 1]
    m_new = jnp.maximum(m_old, jnp.max(s, axis=1, keepdims=True))
    alpha = jnp.exp(m_old - m_new)                              # [TB, 1]
    e = jnp.exp(s - m_new)                                      # [TB, TN]

    l_new = l_sc[:, :1] * alpha + jnp.sum(e, axis=1, keepdims=True)
    q_new = (q_sc[:, :1] * (alpha * alpha)
             + jnp.sum(e * e, axis=1, keepdims=True))
    accx = accx_ref[:] * alpha + jnp.dot(
        e, X1, preferred_element_type=jnp.float32, precision=PREC)
    accy = accy_ref[:] * alpha + jnp.dot(
        e, Y1, preferred_element_type=jnp.float32, precision=PREC)

    accx_ref[:] = accx
    accy_ref[:] = accy
    lanes = m_ref.shape[1]
    m_ref[:] = jnp.broadcast_to(m_new, (m_new.shape[0], lanes))
    l_sc[:] = jnp.broadcast_to(l_new, (l_new.shape[0], lanes))
    q_sc[:] = jnp.broadcast_to(q_new, (q_new.shape[0], lanes))

    @pl.when(j == n_j - 1)
    def _finalize():
        l = l_sc[:, :1]
        inv_l = 1.0 / (l + 1e-30)
        inv_sigma = 1.0 / sigma
        # Σ_i w_i = 1 exactly in softmax form: g = (acc/l − x_t)/σ.
        gx_ref[:] = (accx_ref[:] * inv_l - xt) * inv_sigma
        gy_ref[:] = (accy_ref[:] * inv_l - yt) * inv_sigma
        ess = (l * l) / (q_sc[:, :1] + 1e-30)
        ess_ref[:] = jnp.broadcast_to(ess, ess_ref.shape)
        l_ref[:] = jnp.broadcast_to(l, l_ref.shape)


def _auto_tiles(row_bytes: int) -> Tuple[int, int]:
    """Pick (TB, TN) to fit the v5e ~16MiB scoped VMEM: double-buffered
    X1/Y1 input tiles cost 2·TN·row_bytes; the batch side (x_t/y_t tiles,
    acc scratch, outputs) ≈ 3.5·TB·row_bytes.

    TN never drops below 128: the log-ratio BlockSpec is (1, TN) with TN on
    the lane dim, which Mosaic requires 128-aligned (advisor r2 — a 64×64
    RGB+gray pair, Dx+Dy > 4096 f32, used to pick TN=32 and fail to
    compile). When the fixed TN=128 input tiles exceed their budget, the
    overshoot is charged to the batch side by shrinking TB instead."""
    tn = 512
    while tn > 128 and 2 * tn * row_bytes > 4 * 1024 * 1024:
        tn //= 2
    remaining = 14 * 1024 * 1024 - 2 * tn * row_bytes
    tb = 128
    while tb > 8 and 7 * tb * row_bytes > max(remaining, 2 * 1024 * 1024):
        tb //= 2
    return tb, tn


@functools.partial(jax.jit,
                   static_argnames=("tile_b", "tile_n", "interpret"))
def flash_guidance(
    x_t: jax.Array,        # [B, ...]
    y_t: jax.Array,
    mc_x1: jax.Array,      # [N, ...]
    mc_y1: jax.Array,
    mc_log_ratios: jax.Array,  # [N] log r̂(x1ⁱ, y1ⁱ)
    t: jax.Array,          # scalar
    tile_b: int | None = None,
    tile_n: int | None = None,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Fused guidance (g_x, g_y, ess[B], l[B]); one HBM pass over the MC set.

    ess is the per-trajectory effective sample size of the importance
    weights; l the softmax normalizer (max weight = 1/l). Semantics match
    sample/guided.py:mc_feng_guidance with mc_ratios = exp(mc_log_ratios).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B = x_t.shape[0]
    N = mc_x1.shape[0]
    xt = x_t.reshape(B, -1).astype(jnp.float32)
    yt = y_t.reshape(B, -1).astype(jnp.float32)
    X1 = mc_x1.reshape(N, -1).astype(jnp.float32)
    Y1 = mc_y1.reshape(N, -1).astype(jnp.float32)
    Dx0, Dy0 = xt.shape[1], yt.shape[1]
    if not flash_guidance_fits(Dx0, Dy0):
        raise ValueError(
            f"flash_guidance: pair feature dims ({Dx0}+{Dy0} f32) exceed "
            "the kernel's VMEM tiling capacity (TN is floored at 128 for "
            "lane alignment); use the XLA guidance path "
            "(use_pallas=False or 'auto').")
    Dx, Dy = _round_up(Dx0, 128), _round_up(Dy0, 128)
    if Dx != Dx0:   # zero feature padding is exact
        xt = jnp.pad(xt, ((0, 0), (0, Dx - Dx0)))
        X1 = jnp.pad(X1, ((0, 0), (0, Dx - Dx0)))
    if Dy != Dy0:
        yt = jnp.pad(yt, ((0, 0), (0, Dy - Dy0)))
        Y1 = jnp.pad(Y1, ((0, 0), (0, Dy - Dy0)))

    auto_tb, auto_tn = _auto_tiles(4 * (Dx + Dy))
    TB = min(tile_b or auto_tb, _round_up(B, 8))
    Bp = _round_up(B, TB)
    TN = min(tile_n or auto_tn, _round_up(N, 128))
    Np = _round_up(N, TN)
    if Bp != B:
        xt = jnp.pad(xt, ((0, Bp - B), (0, 0)))
        yt = jnp.pad(yt, ((0, Bp - B), (0, 0)))
    lr = mc_log_ratios.astype(jnp.float32)
    if Np != N:     # padded MC rows get zero softmax mass
        X1 = jnp.pad(X1, ((0, Np - N), (0, 0)))
        Y1 = jnp.pad(Y1, ((0, Np - N), (0, 0)))
        lr = jnp.pad(lr, (0, Np - N), constant_values=NEG_INF)
    lr2d = lr[None, :]

    scalars = jnp.array([t], jnp.float32)
    grid = (Bp // TB, Np // TN)

    gx, gy, ess, l = pl.pallas_call(
        _kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((TB, Dx), lambda i, j, s: (i, 0)),
                pl.BlockSpec((TB, Dy), lambda i, j, s: (i, 0)),
                pl.BlockSpec((TN, Dx), lambda i, j, s: (j, 0)),
                pl.BlockSpec((TN, Dy), lambda i, j, s: (j, 0)),
                pl.BlockSpec((1, TN), lambda i, j, s: (0, j)),
            ],
            out_specs=[
                pl.BlockSpec((TB, Dx), lambda i, j, s: (i, 0)),
                pl.BlockSpec((TB, Dy), lambda i, j, s: (i, 0)),
                pl.BlockSpec((TB, 128), lambda i, j, s: (i, 0)),
                pl.BlockSpec((TB, 128), lambda i, j, s: (i, 0)),
            ],
            scratch_shapes=[
                pltpu.VMEM((TB, Dx), jnp.float32),
                pltpu.VMEM((TB, Dy), jnp.float32),
                pltpu.VMEM((TB, 128), jnp.float32),
                pltpu.VMEM((TB, 128), jnp.float32),
                pltpu.VMEM((TB, 128), jnp.float32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((Bp, Dx), jnp.float32),
            jax.ShapeDtypeStruct((Bp, Dy), jnp.float32),
            jax.ShapeDtypeStruct((Bp, 128), jnp.float32),
            jax.ShapeDtypeStruct((Bp, 128), jnp.float32),
        ],
        interpret=interpret,
    )(scalars, xt, yt, X1, Y1, lr2d)

    g_x = gx[:B, :Dx0].reshape(x_t.shape)
    g_y = gy[:B, :Dy0].reshape(y_t.shape)
    return g_x, g_y, ess[:B, 0], l[:B, 0]


def fused_guidance_pallas(
    x_t: jax.Array,
    y_t: jax.Array,
    mc_x1: jax.Array,
    mc_y1: jax.Array,
    mc_ratios: jax.Array,   # [N] r̂ (NOT log) — legacy surface
    t: jax.Array,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Back-compat wrapper over flash_guidance taking raw ratios."""
    log_r = jnp.log(jnp.maximum(mc_ratios.astype(jnp.float32), 1e-30))
    g_x, g_y, _, _ = flash_guidance(x_t, y_t, mc_x1, mc_y1, log_r, t,
                                    interpret=interpret)
    return g_x, g_y
