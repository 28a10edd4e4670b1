"""Higher-order fixed-step ODE solvers (flow/cfm.py:ode_scan).

The reference integrates with Euler only (flow_utils.py:85-100); midpoint
and Heun are a TPU-framework capability — same single fused lax.scan, two
velocity evals per step, O(dt²) local error. These tests pin:
  * convergence ORDER on an analytic ODE (global error ~dt for Euler,
    ~dt² for midpoint/heun),
  * exact back-compat of the euler aliases,
  * pair-scan/solo-scan consistency per solver,
  * the guided-sampler wiring (midpoint composes with mc_feng guidance;
    heun is rejected when guided — its endpoint eval hits t=1.0 where the
    conditional velocity divides by ε).
"""
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ratio_guided_multimodal_fm_tpu.flow.cfm import (
    SOLVERS,
    euler_scan,
    euler_scan_pair,
    ode_scan,
    ode_scan_pair,
)
from ratio_guided_multimodal_fm_tpu.sample.guided import (
    GuidedSamplerConfig,
    make_guided_sampler,
)

# dx/dt = a·x ⇒ x(1) = x0·e^a. Time-independent, but the solvers only see
# a black-box velocity_fn, so it still separates O(dt) from O(dt²).
_A = 0.7


def _field(x, t):
    return _A * x


def _errs(solver, steps):
    x0 = jnp.full((2, 3), 1.5, jnp.float32)
    exact = 1.5 * math.exp(_A)
    out = {}
    for n in steps:
        x1 = ode_scan(_field, x0, num_steps=n, solver=solver)
        out[n] = abs(float(x1[0, 0]) - exact)
    return out


@pytest.mark.parametrize("solver", ["midpoint", "heun"])
def test_second_order_convergence(solver):
    """Halving dt quarters the global error for the 2nd-order solvers
    (ratio ≈ 4), but only halves it for Euler (ratio ≈ 2)."""
    e2 = _errs(solver, (16, 32))
    ratio2 = e2[16] / e2[32]
    assert 3.3 < ratio2 < 4.7, f"{solver}: error ratio {ratio2:.2f}, want ~4"

    e1 = _errs("euler", (16, 32))
    ratio1 = e1[16] / e1[32]
    assert 1.7 < ratio1 < 2.4, f"euler: error ratio {ratio1:.2f}, want ~2"

    # and at EQUAL step count the high-order solver is far more accurate
    assert e2[16] < e1[16] / 10


def test_midpoint_few_steps_beats_euler_many():
    """The headline claim: 2nd order at N steps ≈ Euler quality at ≫N.
    On the analytic ODE, midpoint-8 must beat Euler-32 (4× fewer steps,
    2 evals/step ⇒ half the velocity evals)."""
    assert _errs("midpoint", (8,))[8] < _errs("euler", (32,))[32]


def test_euler_aliases_are_exact():
    x0 = jnp.asarray(np.random.RandomState(0).randn(4, 5).astype(np.float32))
    a = euler_scan(_field, x0, num_steps=7)
    b = ode_scan(_field, x0, num_steps=7, solver="euler")
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    pair = lambda x, y, t: (_field(x, t), -0.3 * y)
    y0 = jnp.asarray(np.random.RandomState(1).randn(4, 5).astype(np.float32))
    ax, ay = euler_scan_pair(pair, x0, y0, num_steps=7)
    bx, by = ode_scan_pair(pair, x0, y0, num_steps=7, solver="euler")
    np.testing.assert_array_equal(np.asarray(ax), np.asarray(bx))
    np.testing.assert_array_equal(np.asarray(ay), np.asarray(by))


@pytest.mark.parametrize("solver", SOLVERS)
def test_pair_scan_matches_solo_scans(solver):
    """ode_scan_pair on two independent fields == two ode_scan runs,
    bit-for-bit, for every solver (same arithmetic, one scan)."""
    rng = np.random.RandomState(2)
    x0 = jnp.asarray(rng.randn(3, 4).astype(np.float32))
    y0 = jnp.asarray(rng.randn(3, 4).astype(np.float32))
    fy = lambda y, t: -0.4 * y + 0.1
    pair = lambda x, y, t: (_field(x, t), fy(y, t))

    px, py = ode_scan_pair(pair, x0, y0, num_steps=9, solver=solver)
    sx = ode_scan(_field, x0, num_steps=9, solver=solver)
    sy = ode_scan(fy, y0, num_steps=9, solver=solver)
    np.testing.assert_array_equal(np.asarray(px), np.asarray(sx))
    np.testing.assert_array_equal(np.asarray(py), np.asarray(sy))


def test_unknown_solver_rejected():
    x0 = jnp.zeros((2, 2))
    with pytest.raises(ValueError, match="solver"):
        ode_scan(_field, x0, num_steps=4, solver="rk4")
    with pytest.raises(ValueError, match="solver"):
        ode_scan_pair(lambda x, y, t: (x, y), x0, x0, num_steps=4,
                      solver="rk4")
    cfg = GuidedSamplerConfig(num_steps=4, x_shape=(2, 2, 1),
                              y_shape=(2, 2, 1), solver="rk4")
    with pytest.raises(ValueError, match="solver"):
        make_guided_sampler(lambda x, t: x, lambda x, t: x, cfg, None)


def test_heun_guided_rejected_unguided_ok():
    """heun's second eval lands on t=1.0 ⇒ forbidden with guidance (the
    mc_feng conditional velocity divides by ε there), fine unguided."""
    fm = lambda x, t: -0.1 * x
    log_ratio = lambda x, y: -jnp.mean(
        (x.reshape(x.shape[0], -1) - y.reshape(y.shape[0], -1)) ** 2, axis=1)

    cfg = GuidedSamplerConfig(
        guidance_method="mc_feng", guidance_strength=0.5, num_steps=6,
        mc_batch_size=8, x_shape=(4, 4, 1), y_shape=(4, 4, 1), solver="heun")
    with pytest.raises(ValueError, match="heun"):
        make_guided_sampler(fm, fm, cfg, log_ratio)

    cfg_ok = GuidedSamplerConfig(num_steps=6, x_shape=(4, 4, 1),
                                 y_shape=(4, 4, 1), solver="heun")
    sampler = jax.jit(make_guided_sampler(fm, fm, cfg_ok, None),
                      static_argnums=(1,))
    x1, y1, _ = sampler(jax.random.PRNGKey(0), 3)
    assert np.isfinite(np.asarray(x1)).all()
    assert np.isfinite(np.asarray(y1)).all()


def test_midpoint_composes_with_guidance():
    """Guided sampler end-to-end with solver='midpoint': runs, finite, and
    preserves the guidance property (pairs pulled together vs unguided)."""
    cfg_kw = dict(num_steps=12, mc_batch_size=32, x_shape=(4, 4, 1),
                  y_shape=(4, 4, 1), solver="midpoint")
    fm = lambda x, t: jnp.zeros_like(x)
    log_ratio = lambda x, y: -5.0 * jnp.mean(
        (x.reshape(x.shape[0], -1) - y.reshape(y.shape[0], -1)) ** 2, axis=1)

    def dist(method, strength):
        cfg = GuidedSamplerConfig(guidance_method=method,
                                  guidance_strength=strength, **cfg_kw)
        sampler = jax.jit(make_guided_sampler(fm, fm, cfg, log_ratio),
                          static_argnums=(1,))
        x1, y1, diags = sampler(jax.random.PRNGKey(2), 8)
        assert np.isfinite(np.asarray(x1)).all()
        return float(jnp.mean((x1 - y1) ** 2))

    assert dist("mc_feng", 1.0) < dist("none", 0.0)


def test_midpoint_exact_on_conditional_straight_field():
    """On the rectified-flow conditional field v = (x1_tgt - x_t)/(1-t+ε)
    the trajectory is a straight line to x1_tgt; midpoint's half-step eval
    is exactly consistent with the shrinking (1-t) denominator, so it must
    land as close as Euler does (both converge onto the target) — this is
    why midpoint composes with mc_feng guidance (GuidedSamplerConfig
    docstring) while heun cannot."""
    eps = 1e-3
    tgt = jnp.full((2, 3), 2.0, jnp.float32)
    field = lambda x, t: (tgt - x) / (1.0 - t[:, None] + eps)
    x0 = jnp.zeros((2, 3), jnp.float32)
    for solver in ("euler", "midpoint"):
        x1 = ode_scan(field, x0, num_steps=50, solver=solver)
        np.testing.assert_allclose(np.asarray(x1), np.asarray(tgt),
                                   atol=0.1, err_msg=solver)
