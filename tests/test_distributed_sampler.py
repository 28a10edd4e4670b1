"""Distributed guided sampler over a 2-D ('data','mc') fake mesh.

The key claim (parallel/sharded_guidance.py RNG discipline): given the same
key, the distributed sampler produces the SAME samples as the single-device
sampler, up to floating-point reduction order — every shard derives the
single-device noise tensors and slices its rows.
"""
import jax
import jax.numpy as jnp
import numpy as np

from ratio_guided_multimodal_fm_tpu.parallel.mesh import make_mesh
from ratio_guided_multimodal_fm_tpu.parallel.sharded_guidance import (
    make_distributed_guided_sampler,
)
from ratio_guided_multimodal_fm_tpu.sample.guided import (
    GuidedSamplerConfig,
    make_guided_sampler,
)


def _toy_setup():
    fm = lambda x, t: -0.1 * x
    log_ratio = lambda x, y: -5.0 * jnp.mean(
        (x.reshape(x.shape[0], -1) - y.reshape(y.shape[0], -1)) ** 2, axis=1)
    return fm, log_ratio


def _cfg(**kw):
    base = dict(guidance_method="mc_feng", guidance_strength=0.8,
                num_steps=10, mc_batch_size=16, x_shape=(6, 6, 1),
                y_shape=(6, 6, 1))
    base.update(kw)
    return GuidedSamplerConfig(**base)


def test_distributed_sampler_runs_4x2():
    mesh = make_mesh(8, ("data", "mc"), (4, 2))
    fm, log_ratio = _toy_setup()
    sampler = make_distributed_guided_sampler(fm, fm, _cfg(), log_ratio, mesh)
    x1, y1 = sampler(jax.random.PRNGKey(0), 8)
    assert x1.shape == (8, 6, 6, 1)
    assert np.isfinite(np.asarray(x1)).all()
    assert np.isfinite(np.asarray(y1)).all()


def test_distributed_equals_single_device():
    """Same key -> distributed == single-device (both mesh layouts)."""
    fm, log_ratio = _toy_setup()
    cfg = _cfg(num_steps=12, mc_batch_size=16)
    key = jax.random.PRNGKey(3)

    single = jax.jit(make_guided_sampler(fm, fm, cfg, log_ratio),
                     static_argnums=(1,))
    sx, sy, _ = single(key, 8)

    for shape in [(4, 2), (2, 4), (8, 1), (1, 8)]:
        mesh = make_mesh(8, ("data", "mc"), shape)
        dist = make_distributed_guided_sampler(fm, fm, cfg, log_ratio, mesh)
        dx, dy = dist(key, 8)
        np.testing.assert_allclose(np.asarray(dx), np.asarray(sx),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(dy), np.asarray(sy),
                                   rtol=1e-4, atol=1e-5)


def test_distributed_equals_single_device_injected_mc_set():
    """With an injected MC set and injected initial noise, the distributed
    main ODE path must reproduce the single-device path exactly."""
    fm, log_ratio = _toy_setup()
    cfg = _cfg(num_steps=8, mc_batch_size=8, x_shape=(4, 4, 1),
               y_shape=(4, 4, 1))
    key = jax.random.PRNGKey(7)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    mc_x1 = jax.random.normal(k1, (8, 4, 4, 1))
    mc_y1 = jax.random.normal(k2, (8, 4, 4, 1))
    mc_r = jnp.exp(log_ratio(mc_x1, mc_y1))
    x0 = jax.random.normal(k3, (8, 4, 4, 1))
    y0 = jax.random.normal(k4, (8, 4, 4, 1))

    single = jax.jit(make_guided_sampler(fm, fm, cfg, log_ratio),
                     static_argnums=(1,))
    sx, sy, _ = single(key, 8, (mc_x1, mc_y1, mc_r), (x0, y0))

    mesh = make_mesh(8, ("data", "mc"), (2, 4))
    dist = make_distributed_guided_sampler(fm, fm, cfg, log_ratio, mesh)
    dx, dy = dist(key, 8, (mc_x1, mc_y1, mc_r), (x0, y0))
    np.testing.assert_allclose(np.asarray(dx), np.asarray(sx),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(dy), np.asarray(sy),
                               rtol=1e-5, atol=1e-6)


def test_distributed_guidance_improves_coherence():
    """Pair-closeness improves with guidance, same property as single-dev."""
    mesh = make_mesh(8, ("data", "mc"), (2, 4))
    fm, log_ratio = _toy_setup()

    def dist(strength):
        cfg = _cfg(guidance_strength=strength, num_steps=16,
                   mc_batch_size=32, x_shape=(4, 4, 1), y_shape=(4, 4, 1))
        s = make_distributed_guided_sampler(fm, fm, cfg, log_ratio, mesh)
        x1, y1 = s(jax.random.PRNGKey(1), 8)
        return float(jnp.mean((x1 - y1) ** 2))

    assert dist(1.0) < dist(0.0)
