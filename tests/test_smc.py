"""Tests for the SMC (particle-filter) guided sampler (sample/smc.py).

Covers each mechanism in isolation against analytic oracles, then the
composed sampler end-to-end on a closed-form bimodal coupling:

* systematic resampling: identity under uniform weights, degenerate
  collapse, count proportionality (counts in {floor(Bw), ceil(Bw)}).
* flow-score identity + Langevin churn: with the EXACT velocity of a
  Gaussian target, the churn SDE must preserve the terminal marginal
  (the analytic check of ∇log p_t = -(x_t - t v)/(1-t)).
* γ=0, churn=0 reduces bit-exactly to the plain Euler ODE.
* end-to-end: on a two-mode analytic coupling, SMC lifts coherence far
  above unguided while keeping BOTH modes populated (the diversity
  property mc_feng's argmax steering loses).
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ratio_guided_multimodal_fm_tpu.flow.cfm import ode_scan
from ratio_guided_multimodal_fm_tpu.sample.smc import (
    SMCSamplerConfig,
    flow_score,
    make_smc_sampler,
    systematic_resample_idx,
)


# ---------------------------------------------------------------- resampling

def test_systematic_uniform_weights_is_identity():
    b = 17
    w = jnp.full((b,), 1.0 / b)
    for u in (0.0, 0.31, 0.9999):
        idx = systematic_resample_idx(w, jnp.float32(u))
        np.testing.assert_array_equal(np.asarray(idx), np.arange(b))


def test_systematic_degenerate_weight_collapses():
    b = 8
    w = jnp.zeros((b,)).at[5].set(1.0)
    idx = systematic_resample_idx(w, jnp.float32(0.42))
    np.testing.assert_array_equal(np.asarray(idx), np.full(b, 5))


def test_systematic_counts_proportional():
    rng = np.random.RandomState(0)
    b = 64
    w = rng.rand(b).astype(np.float32)
    w /= w.sum()
    for u in rng.rand(5):
        idx = np.asarray(systematic_resample_idx(jnp.array(w),
                                                 jnp.float32(u)))
        counts = np.bincount(idx, minlength=b)
        lo = np.floor(b * w.astype(np.float64))
        hi = np.ceil(b * w.astype(np.float64))
        assert ((counts >= lo - 1e-9) & (counts <= hi + 1e-9)).all(), (
            counts, b * w)


# ------------------------------------------------------- score/churn oracle

def _gaussian_velocity(m, s):
    """Exact rectified-flow velocity for target N(m, s²), prior N(0,1).

    x_t = (1-t)x0 + t·x1 with x0 ⊥ x1 Gaussian ⇒ jointly Gaussian:
      c_t = Var(x_t) = (1-t)² + t²s²
      E[x1|x_t] = m + (t·s²/c_t)(x_t - t·m)
      E[x0|x_t] = ((1-t)/c_t)(x_t - t·m)
      v = E[x1 - x0 | x_t]
    """
    def v(x, t):
        t = t.reshape((-1,) + (1,) * (x.ndim - 1)).astype(jnp.float32)
        c_t = (1 - t) ** 2 + (t * s) ** 2
        e1 = m + (t * s * s / c_t) * (x - t * m)
        e0 = ((1 - t) / c_t) * (x - t * m)
        return e1 - e0
    return v


def test_flow_score_matches_gaussian_score():
    """∇log p_t for the analytic Gaussian flow: p_t = N(t·m, c_t) ⇒
    score = -(x - t·m)/c_t. The identity -(x - t·v)/(1-t) must agree."""
    m, s = 1.3, 0.6
    v_fn = _gaussian_velocity(m, s)
    x = jnp.linspace(-3, 4, 41).reshape(41, 1)
    for t in (0.0, 0.3, 0.7, 0.9):
        tb = jnp.full((41,), t)
        v = v_fn(x, tb)
        got = flow_score(x, v, t)
        c_t = (1 - t) ** 2 + (t * s) ** 2
        want = -(x - t * m) / c_t
        # flow_score carries the sampler's 1e-3 sigma floor; loosen tol
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-2, atol=2e-2)


def test_churn_preserves_gaussian_marginal():
    """γ=0 (no selection), churn=1: the Langevin-churned flow must still
    produce the target N(m, s²) — validates the score identity AND the
    β_t = churn·(1-t)² discretization end-to-end."""
    m, s = -0.8, 0.7
    v_fn = _gaussian_velocity(m, s)
    cfg = SMCSamplerConfig(guidance_strength=0.0, num_steps=64,
                           x_shape=(1,), y_shape=(1,), churn=1.0)
    sampler = jax.jit(
        make_smc_sampler(v_fn, v_fn, cfg, lambda x, y: jnp.zeros(x.shape[0])),
        static_argnums=(1,))
    x1, y1, _ = sampler(jax.random.PRNGKey(0), 8192)
    for out in (np.asarray(x1), np.asarray(y1)):
        assert abs(out.mean() - m) < 0.05, out.mean()
        assert abs(out.std() - s) < 0.05, out.std()


def test_gamma0_churn0_equals_plain_euler():
    m, s = 0.5, 1.2
    v_fn = _gaussian_velocity(m, s)
    cfg = SMCSamplerConfig(guidance_strength=0.0, num_steps=24,
                           x_shape=(1,), y_shape=(1,), churn=0.0)
    sampler = make_smc_sampler(v_fn, v_fn, cfg,
                               lambda x, y: jnp.zeros(x.shape[0]))
    key = jax.random.PRNGKey(3)
    x0 = jax.random.normal(jax.random.PRNGKey(10), (32, 1))
    y0 = jax.random.normal(jax.random.PRNGKey(11), (32, 1))
    x1, y1, _ = sampler(key, 32, init_noise=(x0, y0))
    x1_ref = ode_scan(v_fn, x0, 24)
    y1_ref = ode_scan(v_fn, y0, 24)
    np.testing.assert_array_equal(np.asarray(x1), np.asarray(x1_ref))
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y1_ref))


def test_churn_iters_preserve_gaussian_marginal():
    """churn_iters=3 (two extra pure-Langevin iterations per ODE step at
    t+dt, fresh velocity eval each) must STILL produce the analytic
    target N(m, s²) at γ=0 — Langevin with the exact score leaves p_{t+dt}
    invariant, so extra mixing never moves the marginal."""
    m, s = 0.4, 1.1
    v_fn = _gaussian_velocity(m, s)
    cfg = SMCSamplerConfig(guidance_strength=0.0, num_steps=64,
                           x_shape=(1,), y_shape=(1,),
                           churn=1.0, churn_iters=3)
    sampler = jax.jit(
        make_smc_sampler(v_fn, v_fn, cfg, lambda x, y: jnp.zeros(x.shape[0])),
        static_argnums=(1,))
    x1, y1, _ = sampler(jax.random.PRNGKey(5), 8192)
    for out in (np.asarray(x1), np.asarray(y1)):
        assert abs(out.mean() - m) < 0.05, out.mean()
        assert abs(out.std() - s) < 0.06, out.std()


def test_churn_iters_noop_without_churn():
    """churn=0 gates the extra iterations off statically: churn_iters>1
    must stay bit-identical to the plain deterministic ODE."""
    m, s = 0.5, 1.2
    v_fn = _gaussian_velocity(m, s)
    cfg = SMCSamplerConfig(guidance_strength=0.0, num_steps=24,
                           x_shape=(1,), y_shape=(1,),
                           churn=0.0, churn_iters=4)
    sampler = make_smc_sampler(v_fn, v_fn, cfg,
                               lambda x, y: jnp.zeros(x.shape[0]))
    x0 = jax.random.normal(jax.random.PRNGKey(10), (32, 1))
    y0 = jax.random.normal(jax.random.PRNGKey(11), (32, 1))
    x1, y1, _ = sampler(jax.random.PRNGKey(3), 32, init_noise=(x0, y0))
    np.testing.assert_array_equal(np.asarray(x1),
                                  np.asarray(ode_scan(v_fn, x0, 24)))
    np.testing.assert_array_equal(np.asarray(y1),
                                  np.asarray(ode_scan(v_fn, y0, 24)))


# ------------------------------------------------------------- end-to-end

def _mixture_velocity(mus, s):
    """Exact velocity for a 1-D Gaussian-mixture target (equal weights)."""
    mus = jnp.asarray(mus, jnp.float32)

    def v(x, t):
        t = t.reshape((-1,) + (1,) * (x.ndim - 1)).astype(jnp.float32)
        c_t = (1 - t) ** 2 + (t * s) ** 2
        # responsibilities over components: N(x; t·mu_k, c_t)
        d2 = (x[..., None] - t[..., None] * mus) ** 2 / c_t[..., None]
        resp = jax.nn.softmax(-0.5 * d2, axis=-1)
        e1 = jnp.sum(resp * (mus + (t[..., None] * s * s / c_t[..., None])
                             * (x[..., None] - t[..., None] * mus)), -1)
        e0_scale = (1 - t) / c_t
        e0 = e0_scale * (x - jnp.sum(resp * t[..., None] * mus, -1))
        return e1 - e0
    return v


def test_smc_improves_coherence_and_keeps_both_modes():
    """Two-mode coupling: x and y each ~ 0.5·N(-2,s) + 0.5·N(+2,s);
    coherent pairs have MATCHING signs. Unguided: coherence ≈ 0.5.
    SMC with the sign-agreement potential must push >0.9 while keeping
    both (+,+) and (-,-) modes populated — the anti-mode-collapse claim."""
    s = 0.35
    v_fn = _mixture_velocity((-2.0, 2.0), s)

    def log_ratio(x, y):
        # smooth "same sign" discriminator, |log r| up to ~8
        return 8.0 * jnp.tanh(x[:, 0] * y[:, 0] / 2.0)

    def run(gamma, churn, seed):
        # resample_group=0: characterize the GLOBAL selection scheme (the
        # library/CLI default is island-16; global is kept as the ablation)
        cfg = SMCSamplerConfig(guidance_strength=gamma, num_steps=48,
                               x_shape=(1,), y_shape=(1,), churn=churn,
                               resample_tau=0.5, resample_t_min=0.1,
                               resample_t_max=0.9, resample_group=0)
        sampler = jax.jit(make_smc_sampler(v_fn, v_fn, cfg, log_ratio),
                          static_argnums=(1,))
        x1, y1, diags = sampler(jax.random.PRNGKey(seed), 512)
        x1, y1 = np.asarray(x1)[:, 0], np.asarray(y1)[:, 0]
        coh = float((np.sign(x1) == np.sign(y1)).mean())
        frac_pos = float((x1 > 0).mean())
        return coh, frac_pos, diags

    coh0, _, _ = run(0.0, 1.0, 7)
    assert coh0 < 0.7, f"unguided should be ~0.5, got {coh0}"
    # Mode balance across one SMC run has genealogical variance (resampled
    # lineages correlate) — assert per-seed minority survival plus
    # multi-seed mean balance, not a tight single-seed band.
    cohs, fps = [], []
    for seed in (7, 8, 9):
        coh1, frac_pos, diags = run(1.0, 1.0, seed)
        cohs.append(coh1)
        fps.append(frac_pos)
        # both modes survive selection (mc_feng's argmax steering loses
        # this — its ESS pins at 1 and samples snap onto one candidate)
        assert min(frac_pos, 1 - frac_pos) > 0.1, (
            f"seed {seed}: mode collapsed, frac_pos={frac_pos}")
        # resampling actually fired, and the population ESS recovered
        assert float(np.asarray(diags["resampled"]).sum()) >= 1.0
        assert float(np.asarray(diags["final_ess"])) > 0.2 * 512
    assert min(cohs) > 0.9, f"SMC guidance failed: {coh0} -> {cohs}"
    assert 0.3 < np.mean(fps) < 0.7, f"mean mode balance off: {fps}"


def test_smc_rejects_bad_solver():
    with pytest.raises(ValueError):
        make_smc_sampler(lambda x, t: x, lambda y, t: y,
                         SMCSamplerConfig(solver="heun"),
                         lambda x, y: jnp.zeros(x.shape[0]))


# ----------------------------------------------------- data-sharded particles

def test_smc_sharded_particles_matches_single_device():
    """SMC over a ('data',)-sharded particle population: weights/ESS are
    global (softmax over the full B), resampling gathers across shards —
    XLA inserts the collectives from the sharding annotations alone. Same
    keys ⇒ same samples as the unsharded run (global PRNG semantics)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ratio_guided_multimodal_fm_tpu.parallel.mesh import make_mesh

    s = 0.35
    v_fn = _mixture_velocity((-2.0, 2.0), s)

    def log_ratio(x, y):
        return 8.0 * jnp.tanh(x[:, 0] * y[:, 0] / 2.0)

    # global selection (group=0): the softmax/ESS span the WHOLE sharded
    # population — the heaviest cross-shard collective path
    cfg = SMCSamplerConfig(guidance_strength=1.0, num_steps=16,
                           x_shape=(1,), y_shape=(1,), churn=1.0,
                           resample_tau=0.7, resample_group=0)
    sampler = make_smc_sampler(v_fn, v_fn, cfg, log_ratio)
    b = 64
    key = jax.random.PRNGKey(5)
    x0 = jax.random.normal(jax.random.PRNGKey(20), (b, 1))
    y0 = jax.random.normal(jax.random.PRNGKey(21), (b, 1))

    x_ref, y_ref, _ = jax.jit(sampler, static_argnums=(1,))(
        key, b, (x0, y0))

    mesh = make_mesh(8, ("data",))
    shard = NamedSharding(mesh, P("data"))
    x0s = jax.device_put(x0, shard)
    y0s = jax.device_put(y0, shard)
    x_sh, y_sh, _ = jax.jit(sampler, static_argnums=(1,))(
        key, b, (x0s, y0s))

    np.testing.assert_allclose(np.asarray(x_sh), np.asarray(x_ref),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(y_sh), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-6)

    # island-16 (the default): groups of 16 straddle the 8-shard split of
    # B=64 (8 particles per shard), so per-group softmax/ESS/gather still
    # cross shard boundaries — must also match the unsharded run
    cfg_i = dataclasses.replace(cfg, resample_group=16)
    sampler_i = make_smc_sampler(v_fn, v_fn, cfg_i, log_ratio)
    xi_ref, yi_ref, _ = jax.jit(sampler_i, static_argnums=(1,))(
        key, b, (x0, y0))
    xi_sh, yi_sh, _ = jax.jit(sampler_i, static_argnums=(1,))(
        key, b, (x0s, y0s))
    np.testing.assert_allclose(np.asarray(xi_sh), np.asarray(xi_ref),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(yi_sh), np.asarray(yi_ref),
                               rtol=1e-5, atol=1e-6)


# ------------------------------------------------------ island resampling

def test_island_resampling_preserves_mode_balance():
    """Global selection lets one basin's lineages take over (genealogical
    collapse — observed at image scale as label-entropy collapse,
    docs/results_r4/smc_gamma_sweep.json). Island selection (resample
    within independent groups) must keep the mode split near 50/50 at
    every seed, at equal coherence."""
    s = 0.35
    v_fn = _mixture_velocity((-2.0, 2.0), s)

    def log_ratio(x, y):
        return 8.0 * jnp.tanh(x[:, 0] * y[:, 0] / 2.0)

    fps = []
    for seed in (7, 8, 9, 10):
        cfg = SMCSamplerConfig(guidance_strength=2.0, num_steps=48,
                               x_shape=(1,), y_shape=(1,), churn=1.0,
                               resample_tau=0.5, resample_t_min=0.1,
                               resample_t_max=0.9, resample_group=16)
        sampler = jax.jit(make_smc_sampler(v_fn, v_fn, cfg, log_ratio),
                          static_argnums=(1,))
        x1, y1, diags = sampler(jax.random.PRNGKey(seed), 512)
        x1, y1 = np.asarray(x1)[:, 0], np.asarray(y1)[:, 0]
        coh = float((np.sign(x1) == np.sign(y1)).mean())
        assert coh > 0.9, f"seed {seed}: islands lost coherence ({coh})"
        assert float(np.asarray(diags["resampled"]).sum()) > 0
        fps.append(float((x1 > 0).mean()))
    # 32 independent islands of 16: mode fraction concentrates near 0.5
    # much tighter than the global scheme's 0.13-0.88 swing
    assert all(0.3 < f < 0.7 for f in fps), fps


def test_island_padding_handles_nondividing_batch():
    """B=20 with G=16 → 2 groups with 12 phantom slots: phantoms are never
    selected and the output stays finite/correct."""
    s = 0.35
    v_fn = _mixture_velocity((-2.0, 2.0), s)

    def log_ratio(x, y):
        return 8.0 * jnp.tanh(x[:, 0] * y[:, 0] / 2.0)

    cfg = SMCSamplerConfig(guidance_strength=2.0, num_steps=32,
                           x_shape=(1,), y_shape=(1,), churn=1.0,
                           resample_tau=0.9, resample_t_min=0.05,
                           resample_t_max=0.95, resample_group=16)
    sampler = jax.jit(make_smc_sampler(v_fn, v_fn, cfg, log_ratio),
                      static_argnums=(1,))
    x1, y1, diags = sampler(jax.random.PRNGKey(3), 20)
    assert x1.shape == (20, 1) and np.isfinite(np.asarray(x1)).all()
    assert np.isfinite(np.asarray(y1)).all()
    # tau=0.9 forces resampling events — the padded path actually ran
    assert float(np.asarray(diags["resampled"]).sum()) > 0
    # samples land in the target modes (|x| near 2)
    assert float(np.abs(np.abs(np.asarray(x1)) - 2.0).mean()) < 0.8


# ------------------------------------------------- resample-window semantics

def test_step_window_equals_t_window_on_uniform_grid():
    """resample_window='step' gates on f32(i)·f32(1/N) — the exact uniform
    ts values — so on the uniform grid the two modes are bit-identical."""
    s = 0.35
    v_fn = _mixture_velocity((-2.0, 2.0), s)

    def log_ratio(x, y):
        return 8.0 * jnp.tanh(x[:, 0] * y[:, 0] / 2.0)

    outs = []
    for window in ("t", "step"):
        cfg = SMCSamplerConfig(guidance_strength=1.0, num_steps=24,
                               x_shape=(1,), y_shape=(1,), churn=1.0,
                               resample_window=window)
        sampler = jax.jit(make_smc_sampler(v_fn, v_fn, cfg, log_ratio),
                          static_argnums=(1,))
        outs.append(sampler(jax.random.PRNGKey(5), 64))
    np.testing.assert_array_equal(np.asarray(outs[0][0]),
                                  np.asarray(outs[1][0]))
    np.testing.assert_array_equal(np.asarray(outs[0][1]),
                                  np.asarray(outs[1][1]))


def test_step_window_restores_selection_budget_on_early_grid():
    """The early grid (g(s)=s², power 2) pushes most STEP TIMES below
    resample_t_min — a fixed t-window then starves selection (the
    measured smc_mp12_early failure). 'step' mode must keep the number
    of resample-ELIGIBLE steps identical to the uniform grid's."""
    s = 0.35
    v_fn = _mixture_velocity((-2.0, 2.0), s)

    def log_ratio(x, y):
        return 8.0 * jnp.tanh(x[:, 0] * y[:, 0] / 2.0)

    def resamples(window):
        # tau=1.0: resample at EVERY in-window step → the resampled-event
        # count equals the window's step budget (island mode counts
        # fraction-of-groups per step; all groups fire at tau=1).
        cfg = SMCSamplerConfig(guidance_strength=1.0, num_steps=24,
                               x_shape=(1,), y_shape=(1,), churn=1.0,
                               resample_tau=1.0, time_grid="early",
                               grid_power=2.0, resample_window=window)
        sampler = jax.jit(make_smc_sampler(v_fn, v_fn, cfg, log_ratio),
                          static_argnums=(1,))
        _, _, diags = sampler(jax.random.PRNGKey(6), 64)
        return float(np.asarray(diags["resampled"]).sum())

    n_t, n_step = resamples("t"), resamples("step")
    # early grid, window [0.2, 0.9]: t-mode eligible when (i/24)² ∈
    # [0.2, 0.9] ⇔ i ∈ [11, 22] → 12 steps; step mode when i/24 ∈
    # [0.2, 0.9] ⇔ i ∈ [5, 21] → 17 steps (= the uniform-grid budget).
    assert n_step > n_t, (n_t, n_step)
    # and the step-mode budget matches the uniform-grid t-mode budget
    cfg_u = SMCSamplerConfig(guidance_strength=1.0, num_steps=24,
                             x_shape=(1,), y_shape=(1,), churn=1.0,
                             resample_tau=1.0, resample_window="t")
    sampler_u = jax.jit(make_smc_sampler(v_fn, v_fn, cfg_u, log_ratio),
                        static_argnums=(1,))
    _, _, diags_u = sampler_u(jax.random.PRNGKey(6), 64)
    assert n_step == float(np.asarray(diags_u["resampled"]).sum())


def test_rejects_bad_resample_window():
    with pytest.raises(ValueError):
        make_smc_sampler(lambda x, t: x, lambda y, t: y,
                         SMCSamplerConfig(resample_window="epoch"),
                         lambda x, y: jnp.zeros(x.shape[0]))
