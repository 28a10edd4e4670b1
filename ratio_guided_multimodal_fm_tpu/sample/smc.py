"""SMC (particle-filter) ratio-guided sampling — beyond-reference capability.

The reference's only coupling mechanism is mc_feng (flow_utils.py:178-375):
steer each trajectory toward an importance-weighted mix of a FIXED pool of
N_mc pre-generated candidate pairs. Its measured pathology (ROUND2/ROUND3,
docs/results_r3/frontier_*.json): the weights collapse to argmax within a
few steps (trajectory ESS pins at 1), so guidance buys coherence by
snapping samples onto <=N_mc candidates — a diversity/FID cost that grows
with γ (classifier-FID 91 -> 376 as γ goes 0 -> 5 on the exp-1 full stack).

This module implements the theoretically-consistent alternative: treat the
B pairs being sampled as PARTICLES of a Feynman-Kac flow whose terminal
target is the tempered coupled joint

    π(x, y)  ∝  p_x(x) · p_y(y) · r̂(x, y)^γ        (γ=1: the true joint q)

and sample it with sequential Monte Carlo:

* **Proposal** — the two flow ODEs, made STOCHASTIC with a
  marginal-preserving Langevin churn term. For the rectified-flow path
  x_t = (1-t)x0 + t·x1 with x0 ~ N(0, I), the marginal score is exactly
  recoverable from the learned velocity (no score net needed):

      E[x1|x_t] = x_t + (1-t)·v      E[x0|x_t] = x_t - t·v
      ∇log p_t(x_t) = -E[x0|x_t]/(1-t) = -(x_t - t·v)/(1-t)

  so for ANY β_t >= 0 the SDE  dx = [v + β_t·∇log p_t]dt + sqrt(2β_t)dW
  has the same time marginals as the ODE (Fokker-Planck: the added drift
  and diffusion cancel). We take β_t = churn·(1-t)², which keeps the
  correction bounded:  drift = -churn·(1-t)·(x - t·v),
  noise std = sqrt(2·churn·dt)·(1-t). Churn is what regenerates diversity
  after resampling duplicates a particle — without it an ODE keeps clones
  identical forever.

* **Potential** — incremental twist on the ratio estimator evaluated at
  the flow's endpoint PREDICTION x̂1 = x_t + (1-t)·v (the ratio net is
  terminal-time-only, ref ratio_estimator.py:100, so x̂1 — not x_t — is
  its on-distribution input; same device-side quantities the velocity
  eval already produced). Log-weights accumulate telescoping increments
  logw += γ·(log r̂_k - log r̂_{k-1}), so between resamplings the
  accumulated weight is exactly γ·Δlog r̂ and the terminal total is
  γ·log r̂(x1, y1) up to the (uninformative) t≈0 baseline.

* **Selection** — systematic resampling of whole pairs when the
  population ESS = 1/Σw̄² drops below resample_tau·B, gated to
  t ∈ [resample_t_min, resample_t_max]: early endpoint predictions are
  blurry conditional means (off-distribution for the discriminator — the
  same reason grad guidance failed, DESIGN.md §7c), and late resampling
  would leave churn no time to decorrelate the clones.

Contrast with mc_feng: no candidate pool at all — the proposal is the
full flow, so samples are never snapped onto a finite set; selection
reweights the flow's OWN population. Cost per step: 2 U-Net evals (same
as unguided) + 1 ratio-net eval (~6% of the U-Net cost at exp-1 sizes)
+ O(B·D) gathers — and NO phase A, so SMC is CHEAPER end-to-end than
mc_feng at equal step count.

The whole sampler is one fused `lax.scan` (carry: particles, key,
log-weights, previous log-ratio) — same TPU-first structure as
sample/guided.py; resampling is a batch gather, jit/shard-friendly.

References: Del Moral (2004) Feynman-Kac formulae; Wu et al. (2023)
"Practical and Asymptotically Exact Conditional Sampling in Diffusion
Models" (twisted SMC with endpoint-prediction potentials); Karras et al.
(2022) §4 (churn). Implementation is original, TPU-first.
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from ratio_guided_multimodal_fm_tpu.flow.cfm import (
    TIME_GRIDS,
    make_time_grid,
)

# Solvers supported by the SMC proposal (heun's t=1.0 endpoint eval is fine
# unguided, but SMC composes its churn/score term with 1/(1-t) — midpoint's
# half-step grid keeps every eval strictly inside [0, 1)).
SMC_SOLVERS = ("euler", "midpoint")


def flow_score(x_t: jax.Array, v: jax.Array, t) -> jax.Array:
    """Marginal score ∇log p_t(x_t) from the rectified-flow velocity.

    Exact for the OT-CFM path with standard-normal prior (module
    docstring): -(x_t - t·v)/(1-t). The 1e-3 floor matches the sampler's
    σ floor (guided.py EPS_T); callers gate usage away from t=1 anyway
    (β_t = churn·(1-t)² → the churn term vanishes as (1-t)).
    """
    t = jnp.asarray(t, jnp.float32)
    return -(x_t - t * v) / (1.0 - t + 1e-3)


def systematic_resample_idx(w: jax.Array, u: jax.Array) -> jax.Array:
    """Systematic resampling: B indices with counts in {⌊Bw_i⌋, ⌈Bw_i⌉}.

    `w` [B] normalized weights, `u` scalar ~ U[0,1). One uniform for the
    whole population (lowest-variance standard scheme); jittable — a
    cumsum + searchsorted, no host sync. Uniform weights return
    arange(B) for every u (identity — tested).
    """
    b = w.shape[0]
    cdf = jnp.cumsum(w)
    # guard the last edge against cumsum rounding (cdf[-1] ~ 1-1e-7)
    cdf = cdf.at[-1].set(jnp.maximum(cdf[-1], 1.0))
    positions = (u + jnp.arange(b, dtype=jnp.float32)) / b
    # side='right': strict cdf[j] > pos — under uniform weights idx == arange
    # for EVERY u in [0,1) including the u=0 edge (side='left' would shift).
    idx = jnp.searchsorted(cdf, positions, side="right")
    return jnp.clip(idx, 0, b - 1)


@dataclasses.dataclass(frozen=True)
class SMCSamplerConfig:
    """Config for the SMC guided sampler (sample/smc.py module docstring).

    guidance_strength is the tempering exponent γ on r̂ — the terminal
    target is p_x·p_y·r̂^γ (γ=1 ≈ the true coupled joint; higher
    sharpens coherence like mc_feng's γ but through population
    reweighting, not velocity steering).
    """
    guidance_strength: float = 1.0
    num_steps: int = 100
    x_shape: Tuple[int, ...] = (28, 28, 1)
    y_shape: Tuple[int, ...] = (28, 28, 1)
    # Langevin churn coefficient: β_t = churn·(1-t)². 0 disables the
    # stochastic term (resampled clones then stay identical — only useful
    # for ablations/identity tests).
    churn: float = 1.0
    # Langevin iterations per ODE step: 1 = the single combined SDE step
    # (baseline). k > 1 adds k-1 PURE Langevin iterations at the
    # post-advance time t+dt (fresh velocity eval each — the score moves
    # with the particle), each a marginal-preserving MCMC step targeting
    # p_{t+dt} with step size η = churn·(1-t-dt)²·dt. Why: the churn
    # ablation (docs/results_r4/smc_churn*.json) shows Langevin mixing
    # between selections is the knob that converts resampling pressure
    # into coherence WITHOUT eating diversity — and at few ODE steps
    # (midpoint-12: 0.537 vs euler-100's 0.773) the mixing budget, not
    # the integration error, is what collapses. Extra iterations buy
    # mixing at few steps for 2 U-Net evals each. No-op when churn == 0.
    churn_iters: int = 1
    # Resample when population ESS < resample_tau · B ...
    resample_tau: float = 0.5
    # ... but only inside this window (see module docstring).
    resample_t_min: float = 0.2
    resample_t_max: float = 0.9
    # Window SEMANTICS: 't' gates on raw time t (the protocol of every
    # round-4 measurement). A non-uniform grid then redistributes STEPS
    # out of the fixed t-window — the measured early-grid failure (0.525
    # vs 0.701 uniform at midpoint-12, smc_mp12_early.json) is partly
    # this starvation, not physics (VERDICT r4 weak #6). 'step' gates on
    # the step fraction i/num_steps instead: bit-identical to 't' on the
    # uniform grid (where t_i = i/num_steps) and keeps the selection
    # budget — the NUMBER of resample-eligible steps — constant under any
    # grid. resample_t_min/max are reused as step fractions in this mode.
    resample_window: str = "t"
    # Stratified ("island") selection: 0 = one global population; G > 0
    # partitions the B particles into ceil(B/G) groups that resample
    # INDEPENDENTLY (ESS test, systematic draw, and weight reset all
    # per-group; a non-dividing B gets phantom -inf-weight padding that
    # is never selected). Why this exists (measured, docs/results_r4/
    # smc_gamma_sweep.json): with one global population the ratio net's
    # systematic class-level biases make selection a contest BETWEEN
    # classes — a few high-r̂ lineages take over and label entropy
    # collapses (0.08-1.5 vs mc_feng's ~2.0). Within a small group,
    # selection still favors coherent pairs, but groups never compete —
    # class diversity across groups survives by construction (the same
    # decomposition that makes the chunked-fresh-MC default work for
    # mc_feng). Default 16 = the measured production knee, matching the
    # CLI/serve default; global (0) is kept only as the ablation.
    resample_group: int = 16
    # Optional |log r̂| clip (same semantics as GuidedSamplerConfig).
    log_ratio_clip: Optional[float] = None
    solver: str = "euler"
    time_grid: str = "uniform"
    grid_power: float = 2.0
    scan_unroll: int = 1


def make_smc_sampler_p(
    fm_x_apply: Callable,        # (params_x, x[B,...], t[B]) -> v
    fm_y_apply: Callable,
    cfg: SMCSamplerConfig,
    log_ratio_apply: Callable,   # (ratio_vars, x, y) -> [B]
):
    """Build the fused SMC sampler with params as runtime arguments:

        sampler(params, key, num_samples, init_noise=None)
            -> (x1, y1, diags)

    params = (params_x, params_y, ratio_vars) — same calling convention as
    make_guided_sampler_p (params as jit ARGUMENTS: closure-embedded trees
    blow the remote-compile size limit at 37M params, CLAUDE.md).

    diags (per-step [T] arrays): 'smc_ess' population ESS of the current
    log-weights, 'resampled' 0/1, 'log_r_mean' mean endpoint log-ratio,
    'logw_spread' max-min of the accumulated log-weights.
    """
    if cfg.solver not in SMC_SOLVERS:
        raise ValueError(f"SMC solver must be one of {SMC_SOLVERS}, "
                         f"got {cfg.solver!r}")
    if cfg.time_grid not in TIME_GRIDS:
        raise ValueError(f"time_grid must be one of {TIME_GRIDS}, "
                         f"got {cfg.time_grid!r}")
    if cfg.resample_window not in ("t", "step"):
        raise ValueError("resample_window must be 't' or 'step', "
                         f"got {cfg.resample_window!r}")
    gamma = float(cfg.guidance_strength)
    churn = float(cfg.churn)
    extra_churn = max(int(cfg.churn_iters) - 1, 0) if churn > 0.0 else 0

    def sampler(params, key: jax.Array, num_samples: int, init_noise=None):
        params_x, params_y, ratio_vars = params

        def fm_x(x, t):
            return fm_x_apply(params_x, x, t).astype(jnp.float32)

        def fm_y(y, t):
            return fm_y_apply(params_y, y, t).astype(jnp.float32)

        def log_r(x, y):
            lr = log_ratio_apply(ratio_vars, x, y).astype(jnp.float32)
            if cfg.log_ratio_clip is not None:
                lr = jnp.clip(lr, -cfg.log_ratio_clip, cfg.log_ratio_clip)
            return lr

        kx, ky, kscan = jax.random.split(key, 3)
        if init_noise is not None:
            x_t, y_t = init_noise
            num_samples = x_t.shape[0]
        else:
            x_t = jax.random.normal(kx, (num_samples,) + cfg.x_shape,
                                    jnp.float32)
            y_t = jax.random.normal(ky, (num_samples,) + cfg.y_shape,
                                    jnp.float32)
        b = num_samples
        g = int(cfg.resample_group or 0)
        if g > 0:
            ng = -(-b // g)                     # ceil: phantom padding
            pad = ng * g - b
            # phantom slots carry -inf log-weight: zero selection mass,
            # zero ESS contribution, and the post-resample reset keeps
            # them at -inf (real_mask). Gathers self-map them.
            real_mask = jnp.arange(ng * g) < b   # [NG*G]
            neg_inf = jnp.float32(-jnp.inf)

        def step(carry, tdt):
            x_t, y_t, k, logw, l_prev = carry
            t, dt, frac = tdt
            tb = jnp.full((b,), t, jnp.float32)
            v_x = fm_x(x_t, tb)
            v_y = fm_y(y_t, tb)

            # -- potential: endpoint-prediction log-ratio, telescoping --
            sig = 1.0 - t
            x1_hat = x_t + sig * v_x
            y1_hat = y_t + sig * v_y
            l_now = log_r(x1_hat, y1_hat)                       # [B]
            inc = gamma * (l_now - l_prev)
            # first step (t == 0): baseline only — the endpoint prediction
            # from pure noise carries no pair information.
            logw = logw + jnp.where(t > 0.0, inc, 0.0)
            l_prev = l_now

            # -- selection: systematic resampling on collapsed ESS --
            k, ku, knx, kny = jax.random.split(k, 4)
            gate = frac if cfg.resample_window == "step" else t
            in_window = ((gate >= cfg.resample_t_min)
                         & (gate <= cfg.resample_t_max))
            if g > 0:
                # Stratified/island selection: each group runs its own
                # ESS test + systematic draw (see resample_group docs).
                lwp = jnp.where(real_mask, jnp.pad(logw, (0, pad)),
                                neg_inf)
                lw = lwp.reshape(ng, g)
                wg = jax.nn.softmax(lw, axis=1)                  # [NG, G]
                # real particles per group (phantoms carry zero mass)
                n_real = real_mask.reshape(ng, g).sum(axis=1)
                ess_g = 1.0 / jnp.sum(wg * wg, axis=1)           # [NG]
                do_g = (ess_g < cfg.resample_tau * n_real) & in_window
                us = jax.random.uniform(ku, (ng,))
                idx_g = jax.vmap(systematic_resample_idx)(wg, us)
                # Phantoms are trailing zero-weight slots, but the cdf
                # rounding guard in systematic_resample_idx pins the LAST
                # slot (a phantom in the padded group) to cdf=1.0 — a
                # position landing in the f32 cumsum gap (~1e-7) could
                # select it. Clamp into the real prefix: equivalent to the
                # global mode's "rounding gap goes to the last real slot".
                idx_g = jnp.minimum(idx_g, n_real[:, None] - 1)
                offs = (jnp.arange(ng) * g)[:, None]
                idx_p = jnp.where(do_g[:, None], idx_g + offs,
                                  jnp.arange(ng * g).reshape(ng, g))
                idx = idx_p.reshape(ng * g)[:b]
                lw_new = jnp.where(do_g[:, None], 0.0, lw).reshape(ng * g)
                logw = jnp.where(real_mask, lw_new, neg_inf)[:b]
                # population-scale diagnostics (comparable across modes):
                # sum of group ESS == population ESS when groups are
                # equally weighted; 'resampled' = fraction of groups.
                ess = jnp.sum(ess_g)
                do = jnp.mean(do_g.astype(jnp.float32))
            else:
                m = jnp.max(logw)
                w = jnp.exp(logw - m)
                w = w / jnp.sum(w)
                ess = 1.0 / jnp.sum(w * w)
                do = (ess < cfg.resample_tau * b) & in_window
                idx = systematic_resample_idx(w, jax.random.uniform(ku))
                idx = jnp.where(do, idx, jnp.arange(b))
                logw = jnp.where(do, jnp.zeros_like(logw), logw)
            x_t, y_t = x_t[idx], y_t[idx]
            v_x, v_y = v_x[idx], v_y[idx]
            l_prev = l_prev[idx]

            # -- proposal: flow advance (+ optional half-step correction) --
            if cfg.solver == "midpoint":
                th = jnp.full((b,), t + 0.5 * dt, jnp.float32)
                a_x = fm_x(x_t + 0.5 * dt * v_x, th)
                a_y = fm_y(y_t + 0.5 * dt * v_y, th)
            else:
                a_x, a_y = v_x, v_y
            x_new = x_t + a_x * dt
            y_new = y_t + a_y * dt
            if churn > 0.0:
                # Langevin churn, marginal-preserving (module docstring):
                # β_t = churn·(1-t)²; drift β_t·s·dt with
                # s = -(x - t·v)/(1-t) → -churn·(1-t)·(x - t·v)·dt.
                noise_std = jnp.sqrt(2.0 * churn * dt) * sig
                x_new = (x_new - churn * sig * (x_t - t * v_x) * dt
                         + noise_std * jax.random.normal(knx, x_t.shape))
                y_new = (y_new - churn * sig * (y_t - t * v_y) * dt
                         + noise_std * jax.random.normal(kny, y_t.shape))

            # -- extra Langevin mixing at t+dt (churn_iters > 1) --
            # Pure MCMC iterations targeting p_{t+dt}: drift
            # β·s·dt = -churn·(1-t')·(x - t'·v(x))·dt with a FRESH
            # velocity eval per iteration, noise std sqrt(2β·dt).
            # Marginal-preserving for the exact score (invariant
            # distribution); vanishes as (1-t')² near t'=1 — so the
            # FINAL step (sig_n ≈ 0) is gated off entirely via lax.cond:
            # its iterations would be 2 wasted U-Net evals each whose
            # contribution is multiplied by ~0 (XLA cannot DCE them —
            # sig_n is a traced value).
            if extra_churn > 0:
                t_next = t + dt
                sig_n = 1.0 - t_next

                def _mix(ops):
                    x, y, kk = ops
                    tb_n = jnp.full((b,), t_next, jnp.float32)
                    std_n = jnp.sqrt(2.0 * churn * dt) * sig_n
                    for _ in range(extra_churn):
                        kk, kjx, kjy = jax.random.split(kk, 3)
                        x = (x - churn * sig_n * dt
                             * (x - t_next * fm_x(x, tb_n))
                             + std_n * jax.random.normal(kjx, x.shape))
                        y = (y - churn * sig_n * dt
                             * (y - t_next * fm_y(y, tb_n))
                             + std_n * jax.random.normal(kjy, y.shape))
                    return x, y, kk

                x_new, y_new, k = jax.lax.cond(
                    sig_n > 1e-6, _mix, lambda ops: ops,
                    (x_new, y_new, k))

            diag = {
                "smc_ess": ess,
                "resampled": do.astype(jnp.float32),
                "log_r_mean": jnp.mean(l_now),
                "logw_spread": jnp.max(logw) - jnp.min(logw),
            }
            return (x_new, y_new, k, logw, l_prev), diag

        ts, dts = make_time_grid(cfg.num_steps, cfg.time_grid,
                                 cfg.grid_power)
        # step fractions computed EXACTLY like the uniform grid's ts
        # (f32(i) * f32(1/N)), so resample_window='step' is bit-identical
        # to 't' on the uniform grid.
        fracs = (jnp.arange(cfg.num_steps, dtype=jnp.float32)
                 * jnp.float32(1.0 / cfg.num_steps))
        logw0 = jnp.zeros((b,), jnp.float32)
        (x_t, y_t, _, logw, _), diags = jax.lax.scan(
            step, (x_t, y_t, kscan, logw0, logw0), (ts, dts, fracs),
            unroll=cfg.scan_unroll)
        # Residual terminal weights are reported, not resampled: a final
        # resample would emit exact duplicates (no churn time left to
        # decorrelate them) — by construction the in-window resampling
        # keeps ESS >= tau·B, so the residual skew is bounded.
        if g > 0:
            lwp = jnp.where(real_mask, jnp.pad(logw, (0, pad)), neg_inf)
            wg = jax.nn.softmax(lwp.reshape(ng, g), axis=1)
            diags["final_ess"] = jnp.sum(1.0 / jnp.sum(wg * wg, axis=1))
        else:
            w = jax.nn.softmax(logw)
            diags["final_ess"] = 1.0 / jnp.sum(w * w)
        return x_t, y_t, diags

    return sampler


def make_smc_sampler(
    fm_x_fn: Callable,           # (x[B,...], t[B]) -> v, params bound
    fm_y_fn: Callable,
    cfg: SMCSamplerConfig,
    log_ratio_fn: Callable,      # (x, y) -> [B], params bound
):
    """Closure-sugar variant (small models only — see make_smc_sampler_p)."""
    inner = make_smc_sampler_p(
        lambda _, x, t: fm_x_fn(x, t),
        lambda _, y, t: fm_y_fn(y, t),
        cfg,
        lambda _, x, y: log_ratio_fn(x, y),
    )

    def sampler(key: jax.Array, num_samples: int, init_noise=None):
        return inner((None, None, None), key, num_samples, init_noise)

    return sampler


def sample_bimodal_smc(
    fm_x_fn: Callable,
    fm_y_fn: Callable,
    log_ratio_fn: Callable,
    guidance_strength: float = 1.0,
    num_samples: int = 16,
    num_steps: int = 100,
    x_shape: Tuple[int, ...] = (28, 28, 1),
    y_shape: Tuple[int, ...] = (28, 28, 1),
    key: Optional[jax.Array] = None,
    churn: float = 1.0,
    churn_iters: int = 1,
    resample_tau: float = 0.5,
    resample_t_min: float = 0.2,
    resample_t_max: float = 0.9,
    resample_group: int = 16,
    resample_window: str = "t",
    log_ratio_clip: Optional[float] = None,
    solver: str = "euler",
    time_grid: str = "uniform",
    grid_power: float = 2.0,
    return_diagnostics: bool = False,
):
    """Convenience wrapper mirroring sample_bimodal_guided's surface."""
    if key is None:
        key = jax.random.PRNGKey(42)
    cfg = SMCSamplerConfig(
        guidance_strength=guidance_strength, num_steps=num_steps,
        x_shape=x_shape, y_shape=y_shape, churn=churn,
        churn_iters=churn_iters,
        resample_tau=resample_tau, resample_t_min=resample_t_min,
        resample_t_max=resample_t_max, resample_group=resample_group,
        resample_window=resample_window,
        log_ratio_clip=log_ratio_clip,
        solver=solver, time_grid=time_grid, grid_power=grid_power)
    sampler = jax.jit(make_smc_sampler(fm_x_fn, fm_y_fn, cfg, log_ratio_fn),
                      static_argnums=(1,))
    x1, y1, diags = sampler(key, num_samples)
    if return_diagnostics:
        return x1, y1, diags
    return x1, y1
