"""Guidance-weight math vs a NumPy oracle that replicates the reference's
broadcast formulation literally (flow_utils.py:273-341), including the
[B, N, D] conditional-velocity tensor our implementation refuses to build.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ratio_guided_multimodal_fm_tpu.sample.guided import (
    EPS_T,
    GuidedSamplerConfig,
    make_guided_sampler,
    mc_feng_guidance,
)


def oracle_mc_feng(x_t, y_t, mc_x1, mc_y1, mc_r, t):
    """Literal NumPy transcription of ref flow_utils.py:273-341."""
    B = x_t.shape[0]
    N = mc_x1.shape[0]
    eps = 1e-3
    sigma_t = 1 - t + eps

    xt = x_t.reshape(B, 1, -1)
    yt = y_t.reshape(B, 1, -1)
    X1 = mc_x1.reshape(1, N, -1)
    Y1 = mc_y1.reshape(1, N, -1)

    diff_x = xt - t * X1
    diff_y = yt - t * Y1
    log_p = -0.5 * ((diff_x**2).sum(-1) + (diff_y**2).sum(-1)) / sigma_t**2

    log_p_max = log_p.max(axis=1, keepdims=True)
    p = np.exp(log_p - log_p_max)
    p_bar = p.mean(axis=1, keepdims=True) + 1e-10
    Z_bar = (mc_r[None, :] * p).mean(axis=1, keepdims=True) + 1e-10
    w = (mc_r[None, :] / Z_bar) * (p / p_bar)
    w = w / (w.sum(axis=1, keepdims=True) + 1e-10)

    v_cond_x = (X1 - xt) / (1 - t + eps)  # [B,N,D] — the tensor we avoid
    v_cond_y = (Y1 - yt) / (1 - t + eps)
    g_x = (w[:, :, None] * v_cond_x).sum(axis=1)
    g_y = (w[:, :, None] * v_cond_y).sum(axis=1)
    return g_x.reshape(x_t.shape), g_y.reshape(y_t.shape), w


@pytest.mark.parametrize("t", [0.05, 0.3, 0.7, 0.95, 0.99])
def test_mc_feng_matches_reference_math(t):
    rng = np.random.RandomState(0)
    B, N, H = 5, 16, 6
    x_t = rng.randn(B, H, H, 1).astype(np.float32)
    y_t = rng.randn(B, H, H, 1).astype(np.float32)
    mc_x1 = rng.randn(N, H, H, 1).astype(np.float32)
    mc_y1 = rng.randn(N, H, H, 1).astype(np.float32)
    mc_r = np.exp(rng.randn(N)).astype(np.float32)

    g_x, g_y, diag = mc_feng_guidance(
        jnp.array(x_t), jnp.array(y_t), jnp.array(mc_x1), jnp.array(mc_y1),
        jnp.array(mc_r), jnp.float32(t))
    og_x, og_y, ow = oracle_mc_feng(x_t, y_t, mc_x1, mc_y1, mc_r, t)

    # The matmul expansion ||a-b||² = ||a||²-2a·b+||b||² trades a little
    # cancellation error for MXU throughput; require <1% relative error
    # in the guidance field.
    scale = np.abs(og_x).max() + 1e-8
    assert np.abs(np.asarray(g_x) - og_x).max() / scale < 1e-2
    scale_y = np.abs(og_y).max() + 1e-8
    assert np.abs(np.asarray(g_y) - og_y).max() / scale_y < 1e-2
    np.testing.assert_allclose(float(diag["w_min"]), ow.min(), rtol=2e-2, atol=1e-6)
    np.testing.assert_allclose(float(diag["w_max"]), ow.max(), rtol=2e-2)


def test_weights_uniform_when_ratios_equal():
    """Equal ratios + t→0 (all p equal) ⇒ uniform weights ⇒ g points at the
    MC mean."""
    rng = np.random.RandomState(1)
    N, H = 8, 4
    x_t = np.zeros((2, H, H, 1), np.float32)
    y_t = np.zeros((2, H, H, 1), np.float32)
    mc_x1 = rng.randn(N, H, H, 1).astype(np.float32)
    mc_y1 = rng.randn(N, H, H, 1).astype(np.float32)
    mc_r = np.ones(N, np.float32)

    t = 1e-6  # p_t barely depends on x1 ⇒ ~uniform
    g_x, g_y, diag = mc_feng_guidance(
        jnp.array(x_t), jnp.array(y_t), jnp.array(mc_x1), jnp.array(mc_y1),
        jnp.array(mc_r), jnp.float32(t))
    sigma = 1 - t + EPS_T
    expected = (mc_x1.mean(0) - x_t[0]) / sigma
    np.testing.assert_allclose(np.asarray(g_x[0]), expected, rtol=1e-3, atol=1e-4)


def test_guided_sampler_end_to_end_shapes():
    """Full sampler with toy linear 'models': shapes + finiteness + the
    no-guidance/guidance branch both run."""
    cfg = GuidedSamplerConfig(
        guidance_method="mc_feng", guidance_strength=0.5, num_steps=8,
        mc_batch_size=12, x_shape=(6, 6, 1), y_shape=(6, 6, 1))

    fm = lambda x, t: -0.1 * x
    log_ratio = lambda x, y: -jnp.mean((x.reshape(x.shape[0], -1)
                                        - y.reshape(y.shape[0], -1)) ** 2, axis=1)

    sampler = jax.jit(make_guided_sampler(fm, fm, cfg, log_ratio),
                      static_argnums=(1,))
    x1, y1, diags = sampler(jax.random.PRNGKey(0), 4)
    assert x1.shape == (4, 6, 6, 1) and y1.shape == (4, 6, 6, 1)
    assert np.isfinite(np.asarray(x1)).all()
    assert diags["w_max"].shape == (8,)  # per-step diagnostics


def test_grad_guidance_runs():
    cfg = GuidedSamplerConfig(
        guidance_method="grad", guidance_strength=0.3, num_steps=5,
        x_shape=(4, 4, 1), y_shape=(4, 4, 1))
    fm = lambda x, t: jnp.zeros_like(x)
    log_ratio = lambda x, y: -jnp.sum((x - y).reshape(x.shape[0], -1) ** 2, axis=1)
    sampler = jax.jit(make_guided_sampler(fm, fm, cfg, log_ratio),
                      static_argnums=(1,))
    x1, y1, _ = sampler(jax.random.PRNGKey(1), 3)
    assert np.isfinite(np.asarray(x1)).all()
    assert np.isfinite(np.asarray(y1)).all()


def test_guidance_pulls_pair_together():
    """With a log-ratio favoring x≈y and strong guidance, final pairs should
    be closer than unguided ones — the core property the framework exists for."""
    cfg_kw = dict(num_steps=16, mc_batch_size=64, x_shape=(4, 4, 1),
                  y_shape=(4, 4, 1))
    fm = lambda x, t: jnp.zeros_like(x)  # flows do nothing; prior stays
    log_ratio = lambda x, y: -5.0 * jnp.mean(
        (x.reshape(x.shape[0], -1) - y.reshape(y.shape[0], -1)) ** 2, axis=1)

    def dist(method, strength):
        cfg = GuidedSamplerConfig(guidance_method=method,
                                  guidance_strength=strength, **cfg_kw)
        sampler = jax.jit(make_guided_sampler(fm, fm, cfg, log_ratio),
                          static_argnums=(1,))
        x1, y1, _ = sampler(jax.random.PRNGKey(2), 16)
        return float(jnp.mean((x1 - y1) ** 2))

    assert dist("mc_feng", 1.0) < dist("none", 0.0)
