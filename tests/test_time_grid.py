"""Non-uniform ODE time grids (flow/cfm.py:make_time_grid).

Beyond the reference surface: flow_utils.py:85-100 only has the uniform
Euler grid. At a fixed velocity-eval budget, WHERE the steps sit is a free
accuracy knob; these tests pin:
  * grid invariants (t_0=0, monotone, t_i+dt_i = t_{i+1}, Σdt = 1),
  * bit-exact back-compat of the 'uniform' grid (the default path must
    reproduce the pre-grid scan values exactly),
  * accuracy: a dense-late grid beats uniform on a late-stiff field at the
    same step count (the rectified-flow conditional velocity
    (x1-x_t)/(1-t) is exactly such a field),
  * guided-sampler wiring (config validation, γ=0 identity on any grid).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ratio_guided_multimodal_fm_tpu.flow.cfm import (
    TIME_GRIDS,
    make_time_grid,
    ode_scan,
    ode_scan_pair,
)
from ratio_guided_multimodal_fm_tpu.sample.guided import (
    GuidedSamplerConfig,
    make_guided_sampler,
)


@pytest.mark.parametrize("kind", TIME_GRIDS)
@pytest.mark.parametrize("n", [1, 7, 100])
def test_grid_invariants(kind, n):
    ts, dts = make_time_grid(n, kind)
    ts, dts = np.asarray(ts), np.asarray(dts)
    assert ts.shape == dts.shape == (n,)
    assert ts[0] == 0.0
    assert (dts > 0).all(), "grid must be strictly increasing"
    # t_i + dt_i == t_{i+1}, and the last step lands on t=1
    np.testing.assert_allclose(ts[:-1] + dts[:-1], ts[1:], rtol=1e-6)
    np.testing.assert_allclose(ts[-1] + dts[-1], 1.0, rtol=1e-6)


def test_unknown_grid_rejected():
    with pytest.raises(ValueError, match="grid"):
        make_time_grid(8, "logarithmic")
    x0 = jnp.zeros((2, 2))
    with pytest.raises(ValueError, match="grid"):
        ode_scan(lambda x, t: x, x0, num_steps=4, grid="nope")
    cfg = GuidedSamplerConfig(num_steps=4, x_shape=(2, 2, 1),
                              y_shape=(2, 2, 1), time_grid="nope")
    with pytest.raises(ValueError, match="time_grid"):
        make_guided_sampler(lambda x, t: x, lambda x, t: x, cfg, None)


def test_uniform_grid_matches_reference_values():
    """'uniform' must reproduce the old `t = i·dt` scan bitwise: f32(i)
    times f32(1/N), and constant dt = f32(1/N)."""
    for n in (3, 100, 256):
        ts, dts = make_time_grid(n, "uniform")
        dt = np.float32(1.0 / n)
        np.testing.assert_array_equal(
            np.asarray(ts), np.arange(n, dtype=np.float32) * dt)
        np.testing.assert_array_equal(np.asarray(dts), np.full((n,), dt))


def test_grid_power_controls_late_density():
    """Higher power ⇒ more of the step budget near t=1."""
    _, d2 = make_time_grid(16, "late", power=2.0)
    _, d4 = make_time_grid(16, "late", power=4.0)
    # last-step size shrinks as power grows (denser near 1)
    assert float(d4[-1]) < float(d2[-1])
    # and the first step grows to compensate
    assert float(d4[0]) > float(d2[0])


def test_late_grid_beats_uniform_on_late_stiff_field():
    """dx/dt = p·t^(p-1): all the velocity change lives near t=1 (the
    shape of a sharpening flow; note Euler is EXACT on the linear
    conditional field (tgt-x)/(1-t), so a state-linear field can't
    discriminate grids). x(1) = 1 exactly; Euler = left-Riemann
    quadrature, whose error concentrates where v changes fast — the
    dense-late grid must land closer at the same step count."""
    p = 6.0
    field = lambda x, t: (p * t ** (p - 1.0))[:, None] * jnp.ones_like(x)
    x0 = jnp.zeros((2, 3), jnp.float32)

    def err(grid):
        x1 = ode_scan(field, x0, num_steps=8, grid=grid)
        return abs(float(x1[0, 0]) - 1.0)

    # measured: late 0.246 vs uniform 0.336 at N=8 (27% lower); the margin
    # guards the direction, not the exact ratio
    assert err("late") < 0.8 * err("uniform")


def test_early_grid_beats_uniform_on_early_stiff_field():
    """Mirror case: curvature near t=0 ⇒ 'early' wins."""
    field = lambda x, t: jnp.exp(-8.0 * t)[:, None] * jnp.ones_like(x)
    x0 = jnp.zeros((2, 3), jnp.float32)
    exact = (1.0 - np.exp(-8.0)) / 8.0

    def err(grid):
        x1 = ode_scan(field, x0, num_steps=8, grid=grid)
        return abs(float(x1[0, 0]) - exact)

    assert err("early") < err("uniform")


@pytest.mark.parametrize("grid", ["late", "cosine"])
def test_pair_scan_matches_solo_scans_on_grid(grid):
    fm = lambda x, t: jnp.sin(3.0 * t)[:, None] - 0.2 * x
    pair = lambda x, y, t: (fm(x, t), fm(y, t))
    x0 = jnp.linspace(-1, 1, 6).reshape(2, 3).astype(jnp.float32)
    y0 = -x0
    xs = ode_scan(fm, x0, num_steps=9, grid=grid)
    ys = ode_scan(fm, y0, num_steps=9, grid=grid)
    xp, yp = ode_scan_pair(pair, x0, y0, num_steps=9, grid=grid)
    np.testing.assert_allclose(np.asarray(xs), np.asarray(xp), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(ys), np.asarray(yp), rtol=1e-6)


def test_guided_sampler_gamma0_identity_on_late_grid():
    """mc_feng at γ=0 equals unguided bit-for-bit on a non-uniform grid
    too (the guidance gate multiplies by γ; grid choice must not leak)."""
    fm = lambda x, t: -0.3 * x + t[:, None, None, None]
    log_ratio = lambda x, y: jnp.zeros((x.shape[0],))
    kw = dict(num_steps=10, mc_batch_size=8, x_shape=(4, 4, 1),
              y_shape=(4, 4, 1), time_grid="late", grid_power=3.0)

    def run(method, strength):
        cfg = GuidedSamplerConfig(guidance_method=method,
                                  guidance_strength=strength, **kw)
        sampler = jax.jit(
            make_guided_sampler(fm, fm, cfg,
                                log_ratio if method != "none" else None),
            static_argnums=(1,))
        x1, y1, _ = sampler(jax.random.PRNGKey(5), 4)
        return np.asarray(x1), np.asarray(y1)

    # identical init-noise keys; γ=0 gate zeroes the guidance mix exactly
    xg, yg = run("mc_feng", 0.0)
    xu, yu = run("none", 0.0)
    np.testing.assert_array_equal(xg, xu)
    np.testing.assert_array_equal(yg, yu)


def test_guided_sampler_late_grid_runs_with_guidance():
    """midpoint × late-grid × mc_feng: the full fast-sampling stack is
    finite and still steers (pairs pulled together vs unguided)."""
    fm = lambda x, t: jnp.zeros_like(x)
    log_ratio = lambda x, y: -5.0 * jnp.mean(
        (x.reshape(x.shape[0], -1) - y.reshape(y.shape[0], -1)) ** 2, axis=1)
    kw = dict(num_steps=6, mc_batch_size=16, x_shape=(4, 4, 1),
              y_shape=(4, 4, 1), solver="midpoint", time_grid="late")

    def dist(method, strength):
        cfg = GuidedSamplerConfig(guidance_method=method,
                                  guidance_strength=strength, **kw)
        sampler = jax.jit(make_guided_sampler(fm, fm, cfg, log_ratio),
                          static_argnums=(1,))
        x1, y1, _ = sampler(jax.random.PRNGKey(2), 8)
        assert np.isfinite(np.asarray(x1)).all()
        return float(jnp.mean((x1 - y1) ** 2))

    assert dist("mc_feng", 1.0) < dist("none", 0.0)
