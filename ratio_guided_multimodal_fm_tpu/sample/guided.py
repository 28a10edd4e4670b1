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

* PARAMS ARE SAMPLER ARGUMENTS (`make_guided_sampler_p`): closing a jitted
  program over a large param tree embeds it as constants in the serialized
  module, which remote compilers reject at ~37M params (HTTP 413 — found in
  round 1's 64×64 stretch run). The params-first API matches the reference,
  where models are runtime arguments throughout (flow_utils.py:178-213).
  `make_guided_sampler` remains as closure sugar for small models.

* Optional `mc_axis` shards the N_mc axis across a mesh axis: the row-max,
  means over N, and W@X1 all become pmax/psum reductions — mathematically
  exact (see parallel/sharded_guidance.py).

* Per-step diagnostics include the effective sample size ESS = 1/Σᵢwᵢ² of
  the importance weights — the quantity that collapses to ~1 in the
  weight-degeneracy failure mode (ref prints raw weight stats at 30% of
  steps, flow_utils.py:349-363; ESS is the principled summary). Setting
  `ess_floor` enables the mitigation: per-trajectory guidance strength is
  scaled by min(1, ESS/ess_floor), so trajectories whose weights have
  collapsed fall back toward the unguided flow instead of chasing a single
  MC sample.

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

from ratio_guided_multimodal_fm_tpu.core.guards import check_finite
from ratio_guided_multimodal_fm_tpu.flow.cfm import (
    SOLVERS, TIME_GRIDS, euler_scan, euler_scan_pair, make_time_grid,
    ode_scan, ode_scan_pair)

EPS_T = 1e-3  # guidance gate / sigma floor, matches ref flow_utils.py:224,279

# mc_set carries r̂ = exp(log r̂); a saturated discriminator emits log r̂ in
# the hundreds, and exp overflows f32 to +inf above ~88.7 — the Pallas path
# then log-roundtrips +inf into NaN guidance *silently* (advisor r2). Cap
# log r̂ at 80 (e^80 ≈ 5.5e34, comfortably finite): normalized importance
# weights treat every candidate above the cap as equally dominant, which is
# exactly the regime where the reference's own math is already inf/NaN.
LOG_R_F32_MAX = 80.0


def _flat(x):
    return x.reshape(x.shape[0], -1)


def safe_exp_log_r(log_r: jax.Array) -> jax.Array:
    """exp(log r̂) clamped to stay f32-finite (see LOG_R_F32_MAX)."""
    return jnp.exp(jnp.minimum(log_r, LOG_R_F32_MAX))


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
    diagnostics['ess'] is the per-trajectory effective sample size [B].

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
    check_finite(w, "mc_feng importance weights")

    # g = (W @ X1 - (Σw)·x_t) / σ   — the [B,N,D] tensor never materializes.
    w_total = jnp.sum(w, axis=1, keepdims=True)
    w_sq = jnp.sum(w * w, axis=1, keepdims=True)
    wx = dot(w, X1)                                          # [B,Dx] (MXU)
    wy = dot(w, Y1)
    if mc_axis is not None:
        wx = jax.lax.psum(wx, mc_axis)
        wy = jax.lax.psum(wy, mc_axis)
        w_total = jax.lax.psum(w_total, mc_axis)
        w_sq = jax.lax.psum(w_sq, mc_axis)
    g_x = (wx - w_total * xt) / sigma
    g_y = (wy - w_total * yt) / sigma

    # Effective sample size of the normalized weights: N when uniform,
    # → 1 when collapsed onto a single MC sample.
    ess = (w_total * w_total) / (w_sq + 1e-10)               # [B,1]

    # Diagnostic extrema must reduce over the FULL MC axis too, or sharded
    # and unsharded runs would report different diagnostics for identical
    # math (w/g themselves are already globally exact via psum above).
    w_min = jnp.min(w)
    w_max = jnp.max(w)
    # Per-trajectory argmax candidate index over the FULL MC axis [B] —
    # the candidate each trajectory is currently locked onto (trajectory
    # ESS pins at ~1, so the argmax carries almost all the weight). Used
    # by scripts/mc_refresh_probe.py to count mid-flight re-ranks.
    loc_idx = jnp.argmax(w, axis=1)                          # [B] local
    loc_val = jnp.max(w, axis=1)                             # [B]
    if mc_axis is not None:
        w_min = jax.lax.pmin(w_min, mc_axis)
        w_max = jax.lax.pmax(w_max, mc_axis)
        gmax = jax.lax.pmax(loc_val, mc_axis)
        offset = jax.lax.axis_index(mc_axis) * n_local
        # ties broken toward the largest global index (deterministic on
        # every device, so sharded == unsharded modulo tie order)
        cand = jnp.where(loc_val >= gmax, loc_idx + offset, -1)
        w_argmax = jax.lax.pmax(cand, mc_axis)
    else:
        w_argmax = loc_idx
    diag = {
        "ess": ess[:, 0],
        "w_argmax": w_argmax,
        "w_min": w_min,
        "w_max": w_max,
        "Z_bar_mean": jnp.mean(Z_bar),
        "g_x_norm": jnp.mean(jnp.linalg.norm(g_x, axis=1)),
        "g_y_norm": jnp.mean(jnp.linalg.norm(g_y, axis=1)),
    }
    return g_x.reshape(x_t.shape), g_y.reshape(y_t.shape), diag


@dataclasses.dataclass(frozen=True)
class GuidedSamplerConfig:
    # 'none' | 'mc_feng' | 'grad' | 'mc_feng+grad' (combined: mc_feng
    # mixing first, then the gradient term added — the two mechanisms are
    # complementary: mc_feng steers toward concrete coherent candidates,
    # grad ascends log r̂ locally)
    guidance_method: str = "none"
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
    # Optional ESS floor for adaptive guidance strength: per-trajectory
    # γ_eff = γ·min(1, ESS/ess_floor). Guards the mc_feng weight-collapse
    # failure mode (importance weights degenerate onto one MC sample near
    # t→1, or everywhere when flows are sharp). None = reference parity.
    ess_floor: Optional[float] = None
    # mc_feng guidance backend: False = XLA matmul path (mc_feng_guidance),
    # True = flash-attention-style Pallas kernel (ops/guidance_pallas.py,
    # one HBM pass over the MC set, N_mc bounded by HBM not VMEM),
    # "auto" = Pallas on TPU when the MC axis is not sharded,
    # "interpret" = Pallas in interpret mode (CPU tests only).
    use_pallas: object = False
    # lax.scan unroll factor for the ODE loops (phase A + main loop).
    # Unrolling trades compile time/program size for fewer per-iteration
    # fixed costs — matters on this workload because each step is ~40 tiny
    # conv ops (see bench.py's unroll sweep). 1 = no unrolling.
    scan_unroll: int = 1
    # --- grad-method tuning (VERDICT r2 #7; README.md:159-164 names the
    # method, the reference never wired it up) ---
    # Strength of the gradient term. None = use guidance_strength (so the
    # combined method can weight the two mechanisms independently).
    grad_strength: Optional[float] = None
    # 'const': v += γ_g·∇log r̂ at every gated step (round-2 behavior).
    # 'sigma': v += γ_g·σ_t²·∇log r̂ — the score-SDE convention: the
    #   guidance magnitude tracks the conditional-path variance, so the
    #   term fades as t→1 instead of fighting the sharpening flow.
    grad_scale: str = "const"
    # Gate the gradient term to t < grad_t_max (1.0 = no gate). Late-t
    # gating tests whether grad only helps while trajectories are still
    # malleable (the ratio net is terminal-time-only — ref
    # ratio_estimator.py:100 — so its gradients are off-distribution at
    # small t and its landscape is sharpest near t=1).
    grad_t_max: float = 1.0
    # ODE solver for BOTH the MC phase and the main loop: 'euler'
    # (reference protocol), 'midpoint' or 'heun' (2 evals/step, O(dt²) —
    # Euler-100 quality at far fewer steps on near-straight rectified
    # flows; see flow/cfm.py:ode_scan). 'heun' is unguided-only: its
    # second eval lands on t=1.0 where the mc_feng conditional velocity
    # (x1-x_t)/(1-t+ε) blows up by 1/ε; midpoint's last eval sits at
    # t=1-dt/2 and is exactly consistent with that field (the midpoint
    # correction cancels the (1-t) shrinkage), so it composes cleanly
    # with guidance. Kept LAST in the dataclass: callers construct
    # configs positionally up through the reference-parity fields.
    solver: str = "euler"
    # Step placement for BOTH the MC phase and the main loop
    # (flow/cfm.py:make_time_grid): 'uniform' (reference grid, bit-exact),
    # 'late' (dense near t=1 — where the interpolant sharpens AND the
    # mc_feng conditional velocity (x1-x_t)/(1-t) stiffens), 'early',
    # 'cosine'. At a fixed velocity-eval budget, step placement is a free
    # accuracy knob (docs/results_r3/timegrid_study.json).
    time_grid: str = "uniform"
    # Warp exponent for 'late'/'early' grids (g(s)=1-(1-s)^p / s^p).
    grid_power: float = 2.0
    # Number of FRESH MC candidate sets drawn along each trajectory
    # (mc_feng/mc_feng+grad only). 1 = reference protocol: one set for the
    # whole ODE (flow_utils.py:231-258 generates once per call). K>1 splits
    # the main loop into K equal segments and regenerates the N_mc set
    # (phase A + ratio eval) at each boundary.
    # ABLATION ONLY — MEASURED HARMFUL (round 4, exp-1 full stack, γ=1):
    # coherence 0.824 → 0.363 (K=2) / 0.213 (K=4), FID 218 → 452/641
    # (docs/results_r4/mc_refresh{2,4}_eval.json). Mechanism (confirmed by
    # scripts/mc_refresh_probe.py per-step w_argmax instrumentation,
    # docs/results_r5/mc_refresh_probe.json): within a segment each
    # trajectory locks onto one argmax candidate (ESS≈1) and integrates
    # toward it; a refresh boundary re-ranks against a set that was NOT
    # selected for proximity, so the trajectory is yanked toward a new far
    # candidate with conditional velocity (x1−x_t)/(1−t) — enormous and
    # coherence-free at late t. The original "diversity along time"
    # rationale ignored that the lock IS the guidance signal.
    # Kept for ablations/negative-result reproduction. Cost: K× phase A.
    # Requires num_steps % K == 0; incompatible with a caller-provided
    # mc_set and with a sharded mc_axis.
    mc_refresh: int = 1


def _resolve_pallas(cfg: "GuidedSamplerConfig",
                    mc_axis: Optional[str]) -> bool:
    if cfg.use_pallas is True or cfg.use_pallas == "interpret":
        if mc_axis is not None:
            # The Pallas kernel has no pmax/psum: each device would softmax
            # over only its local MC shard and emit silently wrong guidance.
            # Only the XLA formulation does global reductions (advisor r2).
            raise ValueError(
                "use_pallas=True/'interpret' is incompatible with a sharded "
                "MC axis (mc_axis=%r): the flash kernel reduces only over "
                "the local shard. Use use_pallas='auto' (falls back to the "
                "XLA path when sharded) or unshard the MC axis." % mc_axis)
        return True
    if cfg.use_pallas == "auto":
        import numpy as _np

        from ratio_guided_multimodal_fm_tpu.ops.guidance_pallas import (
            flash_guidance_fits,
            pallas_available,
        )
        # The sharded path needs global pmax/psum reductions inside the
        # weight math — only the XLA formulation supports that. Large
        # feature dims exceed the kernel's VMEM tiling (flash_guidance_fits).
        return (mc_axis is None and pallas_available()
                and flash_guidance_fits(int(_np.prod(cfg.x_shape)),
                                        int(_np.prod(cfg.y_shape))))
    return False


def _make_guided_step(
    fm_x_fn: Callable,            # (x, t[B]) -> v, params already bound
    fm_y_fn: Callable,
    cfg: GuidedSamplerConfig,
    log_ratio_fn: Optional[Callable],   # (x, y) -> [B], params bound
    mc_set,                        # (mc_x1, mc_y1, mc_ratios) or None
    mc_axis: Optional[str],
    fm_pair_fn: Optional[Callable] = None,  # (x, y, t[B]) -> (v_x, v_y)
):
    """Build the main-ODE scan body shared by the single-device and the
    distributed (shard_map) samplers — ONE implementation of the guided
    step (round-1 review flagged three copies). The step evaluates the
    guidance-mixed velocity field with cfg.solver (euler / midpoint /
    unguided heun) — the mixed field is integrated as one ODE, so the
    higher-order correction applies to the guidance term too."""
    method = cfg.guidance_method
    gamma = cfg.guidance_strength
    guided = method != "none" and log_ratio_fn is not None
    use_mc = guided and method in ("mc_feng", "mc_feng+grad")
    use_grad = guided and method in ("grad", "mc_feng+grad")
    grad_gamma = cfg.grad_strength if cfg.grad_strength is not None else gamma
    use_pallas = _resolve_pallas(cfg, mc_axis)
    if cfg.solver not in SOLVERS:
        raise ValueError(f"solver must be one of {SOLVERS}, "
                         f"got {cfg.solver!r}")
    if cfg.time_grid not in TIME_GRIDS:
        raise ValueError(f"time_grid must be one of {TIME_GRIDS}, "
                         f"got {cfg.time_grid!r}")
    if cfg.solver == "heun" and guided:
        raise ValueError(
            "solver='heun' is unguided-only: its endpoint eval at t=1.0 "
            "divides the mc_feng conditional velocity by ε — use "
            "'midpoint' with guidance (exactly consistent with the "
            "(x1-x_t)/(1-t) field)")
    if use_mc and use_pallas:
        # log r̂ hoisted out of the scan (invariant across steps)
        mc_log_r = jnp.log(jnp.maximum(
            mc_set[2].astype(jnp.float32), 1e-30))
        # A non-finite ratio (e.g. an externally built mc_set whose exp
        # overflowed) would become NaN guidance silently in the kernel;
        # fail loudly like the XLA path's weight check does.
        check_finite(mc_log_r, "mc_feng log ratios (pallas path)")

    def mixed_velocity(x_t, y_t, t):
        """Guidance-mixed velocity field at scalar time t → (v_x, v_y, diag)."""
        tb = jnp.full((x_t.shape[0],), t, jnp.float32)
        if fm_pair_fn is not None:
            # Merged-pair path (models/merged.py): one grouped-conv
            # program evaluates both U-Nets — identical math.
            v_x, v_y = fm_pair_fn(x_t, y_t, tb)
            v_x = v_x.astype(jnp.float32)
            v_y = v_y.astype(jnp.float32)
        else:
            v_x = fm_x_fn(x_t, tb).astype(jnp.float32)
            v_y = fm_y_fn(y_t, tb).astype(jnp.float32)

        diag = {}
        if use_mc:
            mc_x1, mc_y1, mc_ratios = mc_set
            if use_pallas:
                from ratio_guided_multimodal_fm_tpu.ops.guidance_pallas import (  # noqa: E501
                    flash_guidance,
                )
                g_x, g_y, ess, l = flash_guidance(
                    x_t, y_t, mc_x1, mc_y1, mc_log_r, jnp.float32(t),
                    interpret=cfg.use_pallas == "interpret")
                diag = {
                    "ess": ess,
                    "w_max": jnp.max(1.0 / (l + 1e-30)),
                    "g_x_norm": jnp.mean(
                        jnp.linalg.norm(_flat(g_x), axis=1)),
                    "g_y_norm": jnp.mean(
                        jnp.linalg.norm(_flat(g_y), axis=1)),
                }
            else:
                g_x, g_y, diag = mc_feng_guidance(
                    x_t, y_t, mc_x1, mc_y1, mc_ratios, t, mc_axis=mc_axis)
            # Guidance gate t > ε (ref :273): inactive at the first step.
            gate = (t > EPS_T).astype(jnp.float32) * gamma
            if cfg.ess_floor is not None:
                scale = jnp.clip(diag["ess"] / cfg.ess_floor, 0.0, 1.0)
                gate = gate * scale.reshape((-1,) + (1,) * (x_t.ndim - 1))
            diag["v_x_norm"] = jnp.mean(jnp.linalg.norm(_flat(v_x), axis=1))
            diag["v_y_norm"] = jnp.mean(jnp.linalg.norm(_flat(v_y), axis=1))
            v_x = (1.0 - gate) * v_x + gate * g_x
            v_y = (1.0 - gate) * v_y + gate * g_y
        if use_grad:
            def lr_sum(xx, yy):
                return jnp.sum(log_ratio_fn(xx, yy).astype(jnp.float32))
            g_x, g_y = jax.grad(lr_sum, argnums=(0, 1))(x_t, y_t)
            gate = (t > EPS_T).astype(jnp.float32) * grad_gamma
            if cfg.grad_t_max < 1.0:
                gate = gate * (t < cfg.grad_t_max).astype(jnp.float32)
            if cfg.grad_scale == "sigma":
                sig = 1.0 - t + EPS_T
                gate = gate * sig * sig
            v_x = v_x + gate * g_x
            v_y = v_y + gate * g_y

        return v_x, v_y, diag

    def step(carry, tdt):
        # xs row from make_time_grid(cfg.num_steps, cfg.time_grid,
        # cfg.grid_power): (t_i, dt_i) — both scan call sites (below and
        # parallel/sharded_guidance.py) feed the same grid.
        x_t, y_t = carry
        t, dt = tdt
        v_x, v_y, diag = mixed_velocity(x_t, y_t, t)
        if cfg.solver == "midpoint":
            # Re-evaluate the full mixed field (guidance included) at the
            # half-step point; diagnostics stay on the t-grid (first eval)
            # so euler/midpoint traces align step-for-step.
            v_x, v_y, _ = mixed_velocity(x_t + 0.5 * dt * v_x,
                                         y_t + 0.5 * dt * v_y,
                                         t + 0.5 * dt)
        elif cfg.solver == "heun":    # unguided-only (checked above)
            v_x2, v_y2, _ = mixed_velocity(x_t + dt * v_x,
                                           y_t + dt * v_y, t + dt)
            v_x = 0.5 * (v_x + v_x2)
            v_y = 0.5 * (v_y + v_y2)
        x_t = x_t + v_x * dt
        y_t = y_t + v_y * dt
        return (x_t, y_t), diag

    return step


def make_guided_sampler_p(
    fm_x_apply: Callable,            # (params_x, x[B,...], t[B]) -> v
    fm_y_apply: Callable,
    cfg: GuidedSamplerConfig,
    log_ratio_apply: Optional[Callable] = None,  # (ratio_vars, x, y) -> [B]
    mc_axis: Optional[str] = None,
    fm_pair_apply: Optional[Callable] = None,
    # (params_x, params_y, x, y, t[B]) -> (v_x, v_y): merged-pair
    # evaluation of both velocity nets in one program (models/merged.py).
    # Same-topology nets only, which implies x_shape == y_shape —
    # enforced below so the main-ODE and phase-A paths can't diverge.
):
    """Build the fused guided sampler with params as runtime arguments:

        sampler(params, key, num_samples, mc_set=None, init_noise=None)
            -> (x1, y1, diags)

    where params = (params_x, params_y, ratio_vars). Passing params as
    arguments (not closure constants) keeps the serialized HLO small — at
    37M params the remote compiler rejects closure-embedded weights — and
    matches the reference, where models are call arguments
    (flow_utils.py:178-213). The returned function is pure/jittable;
    `num_samples` is static via the shape of the initial noise.

    `init_noise=(x0, y0)` overrides the prior draw (used by the distributed
    -equivalence tests); `mc_set=(mc_x1, mc_y1, mc_ratios)` skips phase A
    (eval sweeps amortize it across guidance strengths — the MC set is iid
    from the flows and independent of γ).
    """
    method = cfg.guidance_method
    num_steps = cfg.num_steps
    guided = method != "none" and log_ratio_apply is not None
    # Eager solver validation — fail at build time, not after a 3-10 min
    # remote compile. _make_guided_step re-checks (the distributed sampler
    # calls it directly).
    if cfg.solver not in SOLVERS:
        raise ValueError(f"solver must be one of {SOLVERS}, "
                         f"got {cfg.solver!r}")
    if cfg.time_grid not in TIME_GRIDS:
        raise ValueError(f"time_grid must be one of {TIME_GRIDS}, "
                         f"got {cfg.time_grid!r}")
    if cfg.solver == "heun" and guided:
        raise ValueError(
            "solver='heun' is unguided-only: its endpoint eval at t=1.0 "
            "divides the mc_feng conditional velocity by ε — use "
            "'midpoint' with guidance")
    if fm_pair_apply is not None and cfg.x_shape != cfg.y_shape:
        raise ValueError(
            "fm_pair_apply (merged-pair evaluation) requires "
            f"x_shape == y_shape, got {cfg.x_shape} vs {cfg.y_shape} — "
            "mergeable nets share a topology (models/merged.py:can_merge)")
    use_mc_method = guided and method in ("mc_feng", "mc_feng+grad")
    if cfg.mc_refresh < 1:
        raise ValueError(f"mc_refresh must be >= 1, got {cfg.mc_refresh}")
    if cfg.mc_refresh > 1 and use_mc_method:
        if num_steps % cfg.mc_refresh != 0:
            raise ValueError(
                f"mc_refresh={cfg.mc_refresh} must divide num_steps="
                f"{num_steps} (equal refresh segments)")
        if mc_axis is not None:
            raise ValueError(
                "mc_refresh > 1 is not supported with a sharded mc_axis — "
                "use the single-set distributed sampler "
                "(parallel/sharded_guidance.py) or mc_refresh=1")

    def sampler(params, key: jax.Array, num_samples: int,
                mc_set=None, init_noise=None):
        params_x, params_y, ratio_vars = params
        fm_x_fn = lambda x, t: fm_x_apply(params_x, x, t)   # noqa: E731
        fm_y_fn = lambda y, t: fm_y_apply(params_y, y, t)   # noqa: E731
        fm_pair_fn = None
        if fm_pair_apply is not None:
            fm_pair_fn = lambda x, y, t: fm_pair_apply(   # noqa: E731
                params_x, params_y, x, y, t)
        log_ratio_fn = None
        if log_ratio_apply is not None:
            log_ratio_fn = lambda x, y: log_ratio_apply(ratio_vars, x, y)  # noqa: E731

        kx, ky, kmx, kmy = jax.random.split(key, 4)
        if init_noise is not None:
            x_t, y_t = init_noise
        else:
            x_t = jax.random.normal(kx, (num_samples,) + cfg.x_shape,
                                    jnp.float32)
            y_t = jax.random.normal(ky, (num_samples,) + cfg.y_shape,
                                    jnp.float32)

        def gen_mc(kmx_, kmy_):
            # Phase A: generate N_mc independent pairs from the two flows
            # (ref flow_utils.py:231-258) and their terminal ratios.
            x0 = jax.random.normal(kmx_, (cfg.mc_batch_size,) + cfg.x_shape,
                                   jnp.float32)
            y0 = jax.random.normal(kmy_, (cfg.mc_batch_size,) + cfg.y_shape,
                                   jnp.float32)
            if fm_pair_fn is not None:   # x_shape == y_shape guaranteed
                mc_x1, mc_y1 = ode_scan_pair(fm_pair_fn, x0, y0,
                                             num_steps,
                                             unroll=cfg.scan_unroll,
                                             solver=cfg.solver,
                                             grid=cfg.time_grid,
                                             grid_power=cfg.grid_power)
            else:
                mc_x1 = ode_scan(fm_x_fn, x0, num_steps,
                                 unroll=cfg.scan_unroll,
                                 solver=cfg.solver,
                                 grid=cfg.time_grid,
                                 grid_power=cfg.grid_power)
                mc_y1 = ode_scan(fm_y_fn, y0, num_steps,
                                 unroll=cfg.scan_unroll,
                                 solver=cfg.solver,
                                 grid=cfg.time_grid,
                                 grid_power=cfg.grid_power)
            log_r = log_ratio_fn(mc_x1, mc_y1).astype(jnp.float32)
            if cfg.log_ratio_clip is not None:
                log_r = jnp.clip(log_r, -cfg.log_ratio_clip,
                                 cfg.log_ratio_clip)
            return (mc_x1, mc_y1, safe_exp_log_r(log_r))

        use_mc_method = guided and method in ("mc_feng", "mc_feng+grad")

        if use_mc_method and cfg.mc_refresh > 1:
            # Refresh mode: K fresh candidate sets along the trajectory —
            # an outer scan over K equal segments, each regenerating the
            # MC set (phase A) then running num_steps/K guided steps. The
            # inner step builder is traced inside the segment body, so the
            # whole thing is still ONE fused XLA program (scan of scans).
            if mc_set is not None:
                raise ValueError(
                    "mc_refresh > 1 regenerates the MC set internally — "
                    "a caller-provided mc_set is contradictory (pass "
                    "mc_set=None, or use mc_refresh=1 to amortize one set)")
            K = cfg.mc_refresh
            seg = num_steps // K   # divisibility checked at build time
            ts, dts = make_time_grid(num_steps, cfg.time_grid,
                                     cfg.grid_power)
            seg_ts = ts.reshape(K, seg)
            seg_dts = dts.reshape(K, seg)
            kmxs = jax.random.split(kmx, K)
            kmys = jax.random.split(kmy, K)

            def segment(carry, xs):
                kmx_i, kmy_i, ts_i, dts_i = xs
                step = _make_guided_step(fm_x_fn, fm_y_fn, cfg,
                                         log_ratio_fn, gen_mc(kmx_i, kmy_i),
                                         mc_axis, fm_pair_fn=fm_pair_fn)
                carry, diags = jax.lax.scan(step, carry, (ts_i, dts_i),
                                            unroll=cfg.scan_unroll)
                return carry, diags

            (x_t, y_t), diags = jax.lax.scan(
                segment, (x_t, y_t), (kmxs, kmys, seg_ts, seg_dts))
            # [K, seg, ...] per-step diagnostics → flat [num_steps, ...]
            diags = jax.tree.map(
                lambda a: a.reshape((num_steps,) + a.shape[2:]), diags)
            return x_t, y_t, diags

        if use_mc_method and mc_set is None:
            mc_set = gen_mc(kmx, kmy)

        step = _make_guided_step(fm_x_fn, fm_y_fn, cfg, log_ratio_fn,
                                 mc_set, mc_axis, fm_pair_fn=fm_pair_fn)
        grid = make_time_grid(num_steps, cfg.time_grid, cfg.grid_power)
        (x_t, y_t), diags = jax.lax.scan(step, (x_t, y_t), grid,
                                         unroll=cfg.scan_unroll)
        return x_t, y_t, diags

    return sampler


def make_guided_sampler(
    fm_x_fn: Callable,               # (x[B,...], t[B]) -> v
    fm_y_fn: Callable,
    cfg: GuidedSamplerConfig,
    log_ratio_fn: Optional[Callable] = None,  # (x, y) -> [B]
    mc_axis: Optional[str] = None,
    fm_pair_fn: Optional[Callable] = None,    # (x, y, t[B]) -> (v_x, v_y)
):
    """Closure-sugar variant: params are baked into the callables.

    Fine for small models (≤9M params); for large ones use
    `make_guided_sampler_p` — closure capture embeds params as constants in
    the serialized module (see module docstring).
    """
    inner = make_guided_sampler_p(
        lambda _, x, t: fm_x_fn(x, t),
        lambda _, y, t: fm_y_fn(y, t),
        cfg,
        None if log_ratio_fn is None else (lambda _, x, y: log_ratio_fn(x, y)),
        mc_axis=mc_axis,
        fm_pair_apply=None if fm_pair_fn is None else (
            lambda _px, _py, x, y, t: fm_pair_fn(x, y, t)),
    )

    def sampler(key: jax.Array, num_samples: int, mc_set=None,
                init_noise=None):
        return inner((None, None, None), key, num_samples, mc_set,
                     init_noise)

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
    fm_pair_fn: Optional[Callable] = None,
    solver: str = "euler",
    time_grid: str = "uniform",
    grid_power: float = 2.0,
):
    """Generate the Monte-Carlo guidance set once: (mc_x1, mc_y1, mc_ratios).

    Phase A of the sampler as a standalone (jitted) computation, so eval
    sweeps can reuse one set across guidance strengths — ~70% of per-config
    sampling cost at the default N_mc=256 (measured on v5e).
    `fm_pair_fn` (merged-pair evaluation, models/merged.py) integrates both
    ODEs in one scan when the modality shapes match.
    """
    from ratio_guided_multimodal_fm_tpu.flow.cfm import euler_sample

    kmx, kmy = jax.random.split(jax.random.fold_in(key, 2))
    if fm_pair_fn is not None and tuple(x_shape) == tuple(y_shape):
        x0 = jax.random.normal(kmx, (mc_batch_size,) + tuple(x_shape),
                               jnp.float32)
        y0 = jax.random.normal(kmy, (mc_batch_size,) + tuple(y_shape),
                               jnp.float32)
        mc_x1, mc_y1 = jax.jit(
            ode_scan_pair, static_argnums=(0, 3, 4, 5, 6, 7))(
            fm_pair_fn, x0, y0, num_steps, 1, solver, time_grid, grid_power)
    else:
        mc_x1 = euler_sample(fm_x_fn, kmx, (mc_batch_size,) + tuple(x_shape),
                             num_steps, solver, time_grid, grid_power)
        mc_y1 = euler_sample(fm_y_fn, kmy, (mc_batch_size,) + tuple(y_shape),
                             num_steps, solver, time_grid, grid_power)
    log_r = log_ratio_fn(mc_x1, mc_y1).astype(jnp.float32)
    if log_ratio_clip is not None:
        log_r = jnp.clip(log_r, -log_ratio_clip, log_ratio_clip)
    return mc_x1, mc_y1, safe_exp_log_r(log_r)


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
    ess_floor: Optional[float] = None,
    grad_strength: Optional[float] = None,
    grad_scale: str = "const",
    grad_t_max: float = 1.0,
    fm_pair_fn: Optional[Callable] = None,
    solver: str = "euler",
    time_grid: str = "uniform",
    grid_power: float = 2.0,
    mc_refresh: int = 1,
):
    """Convenience wrapper with the reference's argument surface
    (flow_utils.py:178-213). Returns (samples_x, samples_y) NHWC in [-1,1]-ish.
    `fm_pair_fn` opts into merged-pair evaluation (models/merged.py).
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
        ess_floor=ess_floor,
        grad_strength=grad_strength,
        grad_scale=grad_scale,
        grad_t_max=grad_t_max,
        solver=solver,
        time_grid=time_grid,
        grid_power=grid_power,
        mc_refresh=mc_refresh,
    )
    sampler = jax.jit(
        make_guided_sampler(fm_x_fn, fm_y_fn, cfg, log_ratio_fn,
                            fm_pair_fn=fm_pair_fn),
        static_argnums=(1,),
    )
    x1, y1, diags = sampler(key, num_samples, mc_set)
    if return_diagnostics:
        return x1, y1, diags
    return x1, y1
