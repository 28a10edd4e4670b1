"""Ratio-guided bimodal sampling — the framework's signature path.

Capability parity with ref flow_utils.py:178-375 (`sample_bimodal_guided`)
and sample_mnist_svhn.py:39-177 (cross-modality twin), re-designed TPU-first:

* The ENTIRE pipeline — MC-sample pre-generation (phase A) plus the
  100-step guided ODE (phase B) — is a single jitted program of three
  `lax.scan` loops. The reference dispatches 400+ separate forward passes
  from Python; here XLA sees one graph and pipelines everything.

* The guidance term is algebraically rewritten into MXU matmuls
  (SURVEY §7 hard-part #2). The reference materializes
  v_cond = (x1ⁱ - x_t)/(1-t+ε) of shape [B, N_mc, C, H, W]
  (flow_utils.py:333-341). Using normalized weights w (rows sum to 1):

      g = Σᵢ wᵢ (x1ⁱ - x_t)/σ = (W @ X1 - (Σᵢwᵢ)·x_t)/σ

  so the O(B·N·D) tensor never exists: one [B,N]x[N,D] matmul. Similarly the
  Gaussian log-densities expand to ||x_t||² - 2t·x_t@X1ᵀ + t²||X1||², i.e. a
  [B,D]x[D,N] matmul plus rank-1 terms.

* Weight math runs in f32 regardless of model compute dtype, preserving the
  reference's max-stabilization + epsilon floors (flow_utils.py:304-319)
  under a bf16 activation policy (SURVEY §7 hard-part #1).

* Optional `mc_axis` shards the N_mc axis across a mesh axis: the row-max,
  means over N, and W@X1 all become pmax/psum reductions — mathematically
  exact (see parallel/sharded_guidance.py).

Also implements the README-promised gradient log-ratio method that the
reference documents but never wired up (README.md:159-164, SURVEY §0):
      v_guided = v_ind + γ·∇_{x_t,y_t} log r̂(x_t, y_t).
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

EPS_T = 1e-3  # guidance gate / sigma floor, matches ref flow_utils.py:224,279


def _flat(x):
    return x.reshape(x.shape[0], -1)


def mc_feng_guidance(
    x_t: jax.Array,      # [B, ...]
    y_t: jax.Array,      # [B, ...]
    mc_x1: jax.Array,    # [N, ...] flow-generated MC samples, modality x
    mc_y1: jax.Array,    # [N, ...]
    mc_ratios: jax.Array,  # [N] r̂₁(x1ⁱ, y1ⁱ)
    t: jax.Array,        # scalar
    mc_axis: Optional[str] = None,
) -> Tuple[jax.Array, jax.Array, dict]:
    """One step of Feng et al. Alg. 2 importance-weighted guidance.

    Returns (g_x, g_y, diagnostics). All math in f32. Matches the reference
    term-for-term (flow_utils.py:273-341) including the three 1e-10 floors
    and the per-row max-stabilization, but computed via matmuls.

    With `mc_axis` set (inside shard_map), mc_x1/mc_y1/mc_ratios hold only
    this device's N/n_dev shard; reductions over N go through pmax/psum.
    """
    f32 = jnp.float32
    xt = _flat(x_t).astype(f32)
    yt = _flat(y_t).astype(f32)
    X1 = _flat(mc_x1).astype(f32)
    Y1 = _flat(mc_y1).astype(f32)
    r = mc_ratios.astype(f32)
    t = t.astype(f32)

    n_local = X1.shape[0]
    n_total = n_local
    if mc_axis is not None:
        n_total = n_local * jax.lax.axis_size(mc_axis)

    sigma = 1.0 - t + EPS_T  # ref :279

    # log p_t(x_t|x1ⁱ) + log p_t(y_t|y1ⁱ), up to the constant the reference
    # also drops (flow_utils.py:300-302): -(||xt - t·X1||² + ||yt - t·Y1||²)/2σ²
    # expanded so the cross terms are MXU matmuls.
    # All matmuls here run at HIGHEST precision: JAX's default lowers f32
    # matmuls to bf16 passes, which is fine for conv activations but corrupts
    # the max-stabilized weight math (SURVEY §7 hard-part #1 — verified: the
    # default costs ~3% relative error in g at t=0.7).
    PREC = jax.lax.Precision.HIGHEST
    dot = partial(jnp.matmul, precision=PREC)
    xt2 = jnp.sum(xt * xt, axis=1, keepdims=True)            # [B,1]
    yt2 = jnp.sum(yt * yt, axis=1, keepdims=True)
    X12 = jnp.sum(X1 * X1, axis=1)[None, :]                  # [1,N]
    Y12 = jnp.sum(Y1 * Y1, axis=1)[None, :]
    cross = dot(xt, X1.T) + dot(yt, Y1.T)                    # [B,N]  (MXU)
    sq = xt2 + yt2 - 2.0 * t * cross + (t * t) * (X12 + Y12)
    log_p = -0.5 * sq / (sigma * sigma)                      # [B,N]

    # Max-stabilize across the FULL N (global max when sharded), ref :305-306.
    m = jnp.max(log_p, axis=1, keepdims=True)
    if mc_axis is not None:
        m = jax.lax.pmax(m, mc_axis)
    p = jnp.exp(log_p - m)                                   # [B,N]

    def _mean_n(v):  # mean over the full MC axis
        s = jnp.sum(v, axis=1, keepdims=True)
        if mc_axis is not None:
            s = jax.lax.psum(s, mc_axis)
        return s / n_total

    p_bar = _mean_n(p) + 1e-10                               # ref :309
    Z_bar = _mean_n(r[None, :] * p) + 1e-10                  # ref :315
    w = (r[None, :] / Z_bar) * (p / p_bar)                   # ref :318
    wsum = jnp.sum(w, axis=1, keepdims=True)
    if mc_axis is not None:
        wsum = jax.lax.psum(wsum, mc_axis)
    w = w / (wsum + 1e-10)                                   # ref :319

    # g = (W @ X1 - (Σw)·x_t) / σ   — the [B,N,D] tensor never materializes.
    w_total = jnp.sum(w, axis=1, keepdims=True)
    wx = dot(w, X1)                                          # [B,Dx] (MXU)
    wy = dot(w, Y1)
    if mc_axis is not None:
        wx = jax.lax.psum(wx, mc_axis)
        wy = jax.lax.psum(wy, mc_axis)
        w_total = jax.lax.psum(w_total, mc_axis)
    g_x = (wx - w_total * xt) / sigma
    g_y = (wy - w_total * yt) / sigma

    diag = {
        "w_min": jnp.min(w),
        "w_max": jnp.max(w),
        "Z_bar_mean": jnp.mean(Z_bar),
        "g_x_norm": jnp.mean(jnp.linalg.norm(g_x, axis=1)),
        "g_y_norm": jnp.mean(jnp.linalg.norm(g_y, axis=1)),
    }
    return g_x.reshape(x_t.shape), g_y.reshape(y_t.shape), diag


@dataclasses.dataclass(frozen=True)
class GuidedSamplerConfig:
    guidance_method: str = "none"  # 'none' | 'mc_feng' | 'grad'
    guidance_strength: float = 0.0
    num_steps: int = 100
    mc_batch_size: int = 64
    x_shape: Tuple[int, ...] = (28, 28, 1)  # HWC, per-sample
    y_shape: Tuple[int, ...] = (28, 28, 1)
    # Optional |log r̂| clip for the MC ratios. A saturated discriminator
    # yields exp(log r̂) spanning many orders of magnitude; the importance
    # weights then collapse onto a single MC sample and guided outputs
    # degenerate (observed: coherence → 0, FID 2600+ at γ≥0.5 with a
    # 12-epoch ratio net on well-trained flows). None = reference parity
    # (no clip).
    log_ratio_clip: Optional[float] = None


def make_guided_sampler(
    fm_x_fn: Callable,               # (x[B,...], t[B]) -> v
    fm_y_fn: Callable,
    cfg: GuidedSamplerConfig,
    log_ratio_fn: Optional[Callable] = None,  # (x, y) -> [B]
    mc_axis: Optional[str] = None,
):
    """Build the fused guided sampler: key, num_samples -> (x1, y1, diag).

    The returned function is pure/jittable; `num_samples` is static via the
    shape of the initial noise, so callers jit it once per batch size.
    """
    method = cfg.guidance_method
    gamma = cfg.guidance_strength
    num_steps = cfg.num_steps
    dt = 1.0 / num_steps
    guided = method != "none" and log_ratio_fn is not None

    def _euler(fn, key, shape):
        x = jax.random.normal(key, shape, jnp.float32)

        def step(x_t, i):
            t = jnp.full((shape[0],), i * dt, jnp.float32)
            return x_t + fn(x_t, t).astype(jnp.float32) * dt, None

        x, _ = jax.lax.scan(step, x, jnp.arange(num_steps))
        return x

    def sampler(key: jax.Array, num_samples: int, mc_set=None):
        kx, ky, kmx, kmy = jax.random.split(key, 4)
        x_t = jax.random.normal(kx, (num_samples,) + cfg.x_shape, jnp.float32)
        y_t = jax.random.normal(ky, (num_samples,) + cfg.y_shape, jnp.float32)

        mc_x1 = mc_y1 = mc_ratios = None
        if guided and method == "mc_feng":
            if mc_set is not None:
                # Precomputed MC set (generate_mc_set) — lets eval sweeps
                # amortize phase A across guidance strengths (the MC set is
                # iid from the flows and independent of γ; with a fixed seed
                # the reference would regenerate the identical set anyway).
                mc_x1, mc_y1, mc_ratios = mc_set
            else:
                # Phase A: generate N_mc independent pairs from the two
                # flows (ref flow_utils.py:231-258) and their terminal ratios.
                mc_x1 = _euler(fm_x_fn, kmx, (cfg.mc_batch_size,) + cfg.x_shape)
                mc_y1 = _euler(fm_y_fn, kmy, (cfg.mc_batch_size,) + cfg.y_shape)
                log_r = log_ratio_fn(mc_x1, mc_y1).astype(jnp.float32)
                if cfg.log_ratio_clip is not None:
                    log_r = jnp.clip(log_r, -cfg.log_ratio_clip,
                                     cfg.log_ratio_clip)
                mc_ratios = jnp.exp(log_r)

        def step(carry, i):
            x_t, y_t = carry
            t = i * dt
            tb = jnp.full((num_samples,), t, jnp.float32)
            v_x = fm_x_fn(x_t, tb).astype(jnp.float32)
            v_y = fm_y_fn(y_t, tb).astype(jnp.float32)

            diag = {}
            if guided and method == "mc_feng":
                g_x, g_y, diag = mc_feng_guidance(
                    x_t, y_t, mc_x1, mc_y1, mc_ratios, t, mc_axis=mc_axis)
                # Guidance gate t > ε (ref :273): inactive at the first step.
                gate = (t > EPS_T).astype(jnp.float32) * gamma
                v_x = (1.0 - gate) * v_x + gate * g_x
                v_y = (1.0 - gate) * v_y + gate * g_y
            elif guided and method == "grad":
                def lr_sum(xx, yy):
                    return jnp.sum(log_ratio_fn(xx, yy).astype(jnp.float32))
                g_x, g_y = jax.grad(lr_sum, argnums=(0, 1))(x_t, y_t)
                gate = (t > EPS_T).astype(jnp.float32) * gamma
                v_x = v_x + gate * g_x
                v_y = v_y + gate * g_y

            x_t = x_t + v_x * dt
            y_t = y_t + v_y * dt
            return (x_t, y_t), diag

        (x_t, y_t), diags = jax.lax.scan(step, (x_t, y_t), jnp.arange(num_steps))
        return x_t, y_t, diags

    return sampler


def generate_mc_set(
    fm_x_fn: Callable,
    fm_y_fn: Callable,
    log_ratio_fn: Callable,
    key: jax.Array,
    mc_batch_size: int,
    x_shape: Tuple[int, ...],
    y_shape: Tuple[int, ...],
    num_steps: int = 100,
    log_ratio_clip: Optional[float] = None,
):
    """Generate the Monte-Carlo guidance set once: (mc_x1, mc_y1, mc_ratios).

    Phase A of the sampler as a standalone (jitted) computation, so eval
    sweeps can reuse one set across guidance strengths — ~70% of per-config
    sampling cost at the default N_mc=256 (measured on v5e).
    """
    from ratio_guided_multimodal_fm_tpu.flow.cfm import euler_sample

    kmx, kmy = jax.random.split(jax.random.fold_in(key, 2))
    mc_x1 = euler_sample(fm_x_fn, kmx, (mc_batch_size,) + tuple(x_shape),
                         num_steps)
    mc_y1 = euler_sample(fm_y_fn, kmy, (mc_batch_size,) + tuple(y_shape),
                         num_steps)
    log_r = log_ratio_fn(mc_x1, mc_y1).astype(jnp.float32)
    if log_ratio_clip is not None:
        log_r = jnp.clip(log_r, -log_ratio_clip, log_ratio_clip)
    return mc_x1, mc_y1, jnp.exp(log_r)


def sample_bimodal_guided(
    fm_x_fn: Callable,
    fm_y_fn: Callable,
    log_ratio_fn: Optional[Callable] = None,
    guidance_method: str = "none",
    guidance_strength: float = 0.0,
    num_samples: int = 16,
    num_steps: int = 100,
    mc_batch_size: int = 64,
    x_shape: Tuple[int, ...] = (28, 28, 1),
    y_shape: Tuple[int, ...] = (28, 28, 1),
    key: Optional[jax.Array] = None,
    return_diagnostics: bool = False,
    mc_set=None,
    log_ratio_clip: Optional[float] = None,
):
    """Convenience wrapper with the reference's argument surface
    (flow_utils.py:178-213). Returns (samples_x, samples_y) NHWC in [-1,1]-ish.
    """
    if key is None:
        key = jax.random.PRNGKey(42)
    cfg = GuidedSamplerConfig(
        guidance_method=guidance_method,
        guidance_strength=guidance_strength,
        num_steps=num_steps,
        mc_batch_size=mc_batch_size,
        x_shape=x_shape,
        y_shape=y_shape,
        log_ratio_clip=log_ratio_clip,
    )
    sampler = jax.jit(
        make_guided_sampler(fm_x_fn, fm_y_fn, cfg, log_ratio_fn),
        static_argnums=(1,),
    )
    x1, y1, diags = sampler(key, num_samples, mc_set)
    if return_diagnostics:
        return x1, y1, diags
    return x1, y1
