"""Mid-trajectory MC-set refresh (GuidedSamplerConfig.mc_refresh).

The reference generates ONE MC candidate set per sampling call
(flow_utils.py:231-258) and reuses it for all 100 guided steps; the
importance-sampling estimate is unbiased for ANY iid set, so regenerating
it mid-trajectory is equally valid math with different finite-set bias.
mc_refresh=K splits the main ODE into K equal segments with a fresh
phase A each — these tests pin the identities that make the knob safe:

* K=1 is the untouched reference-protocol code path (bitwise).
* gamma=0 makes refresh a no-op on the samples (guidance gate never
  fires), regardless of K — bitwise vs the unguided trajectory.
* K>1 actually changes guided outputs (fresh sets re-rank candidates).
* per-step diagnostics keep the flat [num_steps] layout.
* invalid combinations fail eagerly (indivisible num_steps, caller
  mc_set, sharded mc_axis).
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ratio_guided_multimodal_fm_tpu.sample.guided import (
    GuidedSamplerConfig,
    make_guided_sampler,
)


FM = lambda x, t: -0.15 * x  # noqa: E731


def _log_ratio(x, y):
    return -3.0 * jnp.mean(
        (x.reshape(x.shape[0], -1) - y.reshape(y.shape[0], -1)) ** 2,
        axis=1)


def _run(mc_refresh, strength=1.0, num_steps=8, solver="euler", key=0):
    cfg = GuidedSamplerConfig(
        guidance_method="mc_feng", guidance_strength=strength,
        num_steps=num_steps, mc_batch_size=12,
        x_shape=(5, 5, 1), y_shape=(5, 5, 1),
        solver=solver, mc_refresh=mc_refresh)
    sampler = jax.jit(make_guided_sampler(FM, FM, cfg, _log_ratio),
                      static_argnums=(1,))
    return sampler(jax.random.PRNGKey(key), 6)


def test_refresh1_is_reference_path_bitwise():
    """mc_refresh=1 must be byte-identical to the default config — the
    reference-protocol path is untouched code."""
    x_a, y_a, d_a = _run(mc_refresh=1)
    cfg = GuidedSamplerConfig(
        guidance_method="mc_feng", guidance_strength=1.0, num_steps=8,
        mc_batch_size=12, x_shape=(5, 5, 1), y_shape=(5, 5, 1))
    sampler = jax.jit(make_guided_sampler(FM, FM, cfg, _log_ratio),
                      static_argnums=(1,))
    x_b, y_b, d_b = sampler(jax.random.PRNGKey(0), 6)
    np.testing.assert_array_equal(np.asarray(x_a), np.asarray(x_b))
    np.testing.assert_array_equal(np.asarray(y_a), np.asarray(y_b))
    np.testing.assert_array_equal(np.asarray(d_a["ess"]),
                                  np.asarray(d_b["ess"]))


def test_gamma0_refresh_is_noop_bitwise():
    """At gamma=0 the guidance gate is 0 every step, so K=4 and K=1 must
    integrate the identical unguided trajectory (phase A keys differ but
    never touch the samples)."""
    x_1, y_1, _ = _run(mc_refresh=1, strength=0.0)
    x_4, y_4, _ = _run(mc_refresh=4, strength=0.0)
    np.testing.assert_array_equal(np.asarray(x_1), np.asarray(x_4))
    np.testing.assert_array_equal(np.asarray(y_1), np.asarray(y_4))


def test_refresh_changes_guided_output_and_stays_finite():
    x_1, _, d_1 = _run(mc_refresh=1)
    x_4, y_4, d_4 = _run(mc_refresh=4)
    assert np.isfinite(np.asarray(x_4)).all()
    assert np.isfinite(np.asarray(y_4)).all()
    assert not np.array_equal(np.asarray(x_1), np.asarray(x_4))
    # Per-step diagnostics flatten back to [num_steps] / [num_steps, B].
    assert d_4["w_max"].shape == (8,)
    assert d_4["ess"].shape == (8, 6)
    assert d_1["ess"].shape == (8, 6)


def test_refresh_composes_with_midpoint_solver():
    x, y, d = _run(mc_refresh=2, solver="midpoint", num_steps=8)
    assert np.isfinite(np.asarray(x)).all()
    assert d["w_max"].shape == (8,)


def test_refresh_guidance_still_pulls_pairs_together():
    """The core property survives refreshing: guided pairs end closer
    than unguided ones (same harness as test_guidance.py)."""
    fm0 = lambda x, t: jnp.zeros_like(x)  # noqa: E731
    strong = lambda x, y: -5.0 * jnp.mean(  # noqa: E731
        (x.reshape(x.shape[0], -1) - y.reshape(y.shape[0], -1)) ** 2,
        axis=1)

    def dist(method, strength, refresh):
        cfg = GuidedSamplerConfig(
            guidance_method=method, guidance_strength=strength,
            num_steps=16, mc_batch_size=64,
            x_shape=(4, 4, 1), y_shape=(4, 4, 1), mc_refresh=refresh)
        sampler = jax.jit(make_guided_sampler(fm0, fm0, cfg, strong),
                          static_argnums=(1,))
        x1, y1, _ = sampler(jax.random.PRNGKey(2), 16)
        return float(jnp.mean((x1 - y1) ** 2))

    assert dist("mc_feng", 1.0, refresh=4) < dist("none", 0.0, refresh=1)


def test_indivisible_num_steps_fails_eagerly():
    with pytest.raises(ValueError, match="must divide num_steps"):
        _run(mc_refresh=3, num_steps=8)


def test_caller_mc_set_rejected():
    cfg = GuidedSamplerConfig(
        guidance_method="mc_feng", guidance_strength=1.0, num_steps=8,
        mc_batch_size=12, x_shape=(5, 5, 1), y_shape=(5, 5, 1),
        mc_refresh=2)
    sampler = make_guided_sampler(FM, FM, cfg, _log_ratio)
    mc = (jnp.zeros((12, 5, 5, 1)), jnp.zeros((12, 5, 5, 1)),
          jnp.ones((12,)))
    with pytest.raises(ValueError, match="mc_refresh > 1 regenerates"):
        sampler(jax.random.PRNGKey(0), 6, mc)


def test_sharded_mc_axis_rejected():
    from ratio_guided_multimodal_fm_tpu.sample.guided import (
        make_guided_sampler_p)
    cfg = GuidedSamplerConfig(
        guidance_method="mc_feng", guidance_strength=1.0, num_steps=8,
        mc_batch_size=12, x_shape=(5, 5, 1), y_shape=(5, 5, 1),
        mc_refresh=2)
    with pytest.raises(ValueError, match="sharded mc_axis"):
        make_guided_sampler_p(lambda p, x, t: FM(x, t),
                              lambda p, y, t: FM(y, t), cfg,
                              lambda p, x, y: _log_ratio(x, y),
                              mc_axis="mc")


def test_refresh_noop_for_non_mc_methods():
    """mc_refresh is ignored (not an error) for methods without an MC
    set, so CLIs can pass the flag uniformly."""
    cfg = GuidedSamplerConfig(
        guidance_method="grad", guidance_strength=0.3, num_steps=5,
        x_shape=(4, 4, 1), y_shape=(4, 4, 1), mc_refresh=5)
    sampler = jax.jit(make_guided_sampler(FM, FM, cfg, _log_ratio),
                      static_argnums=(1,))
    x1, _, _ = sampler(jax.random.PRNGKey(1), 3)
    assert np.isfinite(np.asarray(x1)).all()


def test_invalid_refresh_count():
    with pytest.raises(ValueError, match="mc_refresh must be >= 1"):
        _run(mc_refresh=0)
