"""Grad-guidance tuning options (VERDICT r2 #7): sigma scaling, t-gating,
separate strength, and the combined mc_feng+grad method."""
import jax
import jax.numpy as jnp
import numpy as np

from ratio_guided_multimodal_fm_tpu.sample.guided import (
    GuidedSamplerConfig,
    make_guided_sampler,
)

FM = lambda x, t: jnp.zeros_like(x)                       # noqa: E731
# log r̂ pulls x and y together (maximized at x == y)
LR = lambda x, y: -jnp.sum(                               # noqa: E731
    (x - y).reshape(x.shape[0], -1) ** 2, axis=1)
SHAPES = dict(x_shape=(4, 4, 1), y_shape=(4, 4, 1))


def _run(cfg, n=4, seed=1):
    sampler = jax.jit(make_guided_sampler(FM, FM, cfg, LR),
                      static_argnums=(1,))
    x1, y1, d = sampler(jax.random.PRNGKey(seed), n)
    return np.asarray(x1), np.asarray(y1), d


def _gap(x, y):
    return float(np.mean((x - y) ** 2))


def test_sigma_scaling_weakens_late_guidance():
    base = dict(guidance_method="grad", guidance_strength=0.4,
                num_steps=12, **SHAPES)
    x_c, y_c, _ = _run(GuidedSamplerConfig(**base, grad_scale="const"))
    x_s, y_s, _ = _run(GuidedSamplerConfig(**base, grad_scale="sigma"))
    x_u, y_u, _ = _run(GuidedSamplerConfig(
        guidance_method="none", num_steps=12, **SHAPES))
    # sigma^2-scaled guidance is strictly weaker than const overall
    assert _gap(x_u, y_u) > _gap(x_c, y_c)
    assert _gap(x_s, y_s) > _gap(x_c, y_c)
    assert np.isfinite(x_s).all()


def test_t_gate_disables_late_steps():
    base = dict(guidance_method="grad", guidance_strength=0.4,
                num_steps=12, **SHAPES)
    x_full, y_full, _ = _run(GuidedSamplerConfig(**base))
    x_gated, y_gated, _ = _run(GuidedSamplerConfig(**base, grad_t_max=0.5))
    # gating off the second half must reduce the total pull
    assert _gap(x_gated, y_gated) > _gap(x_full, y_full)
    # grad_t_max=1.0 is exactly the ungated path
    x_one, _, _ = _run(GuidedSamplerConfig(**base, grad_t_max=1.0))
    np.testing.assert_array_equal(x_one, x_full)


def test_combined_method_applies_both_terms():
    base = dict(num_steps=10, mc_batch_size=16, **SHAPES)
    x_mc, y_mc, d_mc = _run(GuidedSamplerConfig(
        guidance_method="mc_feng", guidance_strength=0.5, **base))
    x_cb, y_cb, d_cb = _run(GuidedSamplerConfig(
        guidance_method="mc_feng+grad", guidance_strength=0.5,
        grad_strength=0.3, **base))
    assert "ess" in d_cb                       # mc_feng diagnostics present
    assert np.isfinite(x_cb).all() and np.isfinite(y_cb).all()
    # the grad term changes the trajectory vs pure mc_feng
    assert not np.allclose(x_cb, x_mc)
    # grad_strength=0 collapses the combined method onto pure mc_feng
    x_z, _, _ = _run(GuidedSamplerConfig(
        guidance_method="mc_feng+grad", guidance_strength=0.5,
        grad_strength=0.0, **base))
    np.testing.assert_array_equal(x_z, x_mc)


def test_separate_grad_strength():
    base = dict(guidance_method="grad", num_steps=8, **SHAPES)
    x_a, y_a, _ = _run(GuidedSamplerConfig(
        **base, guidance_strength=0.1, grad_strength=0.5))
    x_b, y_b, _ = _run(GuidedSamplerConfig(
        **base, guidance_strength=0.5))
    # grad_strength overrides guidance_strength for the grad term
    np.testing.assert_array_equal(x_a, x_b)
