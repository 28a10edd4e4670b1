"""Params-as-arguments sampler API (make_guided_sampler_p) + ESS guards.

Round-1 finding: closing the jitted sampler over a large param tree embeds
it as constants in the serialized module (rejected at ~37M params by the
remote compiler). The params-first API is the fix; these tests pin its
equivalence to the closure sugar and the ESS diagnostics/mitigation.
"""
import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ratio_guided_multimodal_fm_tpu.sample.guided import (
    GuidedSamplerConfig,
    make_guided_sampler,
    make_guided_sampler_p,
)


class TinyVel(nn.Module):
    @nn.compact
    def __call__(self, x, t):
        h = nn.Conv(4, (3, 3), padding="SAME")(x)
        h = nn.silu(h + t.reshape(-1, 1, 1, 1))
        return nn.Conv(x.shape[-1], (3, 3), padding="SAME")(h)


def _setup():
    model = TinyVel()
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 6, 6, 1)),
                        jnp.zeros((1,)))["params"]
    log_ratio = lambda x, y: -3.0 * jnp.mean(
        (x.reshape(x.shape[0], -1) - y.reshape(y.shape[0], -1)) ** 2, axis=1)
    cfg = GuidedSamplerConfig(
        guidance_method="mc_feng", guidance_strength=0.7, num_steps=8,
        mc_batch_size=8, x_shape=(6, 6, 1), y_shape=(6, 6, 1))
    return model, params, log_ratio, cfg


def test_params_api_equals_closure_api():
    model, params, log_ratio, cfg = _setup()
    key = jax.random.PRNGKey(5)

    closure = jax.jit(make_guided_sampler(
        lambda x, t: model.apply({"params": params}, x, t),
        lambda y, t: model.apply({"params": params}, y, t),
        cfg, log_ratio), static_argnums=(1,))
    cx, cy, _ = closure(key, 4)

    params_first = jax.jit(make_guided_sampler_p(
        lambda p, x, t: model.apply({"params": p}, x, t),
        lambda p, y, t: model.apply({"params": p}, y, t),
        cfg, lambda v, x, y: log_ratio(x, y)), static_argnums=(2,))
    px, py, diags = params_first((params, params, None), key, 4)

    np.testing.assert_allclose(np.asarray(px), np.asarray(cx), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(py), np.asarray(cy), rtol=1e-6)
    # ESS diagnostic present, within [1, N_mc]
    ess = np.asarray(diags["ess"])
    assert ess.shape == (cfg.num_steps, 4)
    assert (ess[1:] >= 1.0 - 1e-3).all() and (ess <= cfg.mc_batch_size + 1e-3).all()


def test_scan_unroll_preserves_trajectories():
    """Unrolling the ODE scans is a pure scheduling choice — outputs must
    be identical (same op sequence, same RNG) to the rolled program."""
    model, params, log_ratio, cfg = _setup()
    key = jax.random.PRNGKey(7)

    def run(unroll):
        cfg_u = GuidedSamplerConfig(
            **{**cfg.__dict__, "scan_unroll": unroll})
        s = jax.jit(make_guided_sampler_p(
            lambda p, x, t: model.apply({"params": p}, x, t),
            lambda p, y, t: model.apply({"params": p}, y, t),
            cfg_u, lambda v, x, y: log_ratio(x, y)), static_argnums=(2,))
        return s((params, params, None), key, 4)

    x1, y1, _ = run(1)
    x4, y4, _ = run(4)
    np.testing.assert_allclose(np.asarray(x4), np.asarray(x1), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(y4), np.asarray(y1), rtol=1e-6)


def test_ess_floor_damps_collapsed_guidance():
    """A spiky ratio (one dominant MC sample) collapses the weights
    (ESS→1); with an ESS floor the sampler must fall back toward the
    unguided trajectory instead of chasing that one sample."""
    fm = lambda x, t: -0.1 * x
    # ratio that massively upweights exactly one MC sample
    def spiky_log_ratio(x, y):
        n = x.shape[0]
        return jnp.where(jnp.arange(n) == 0, 40.0, -40.0)

    base = dict(guidance_method="mc_feng", guidance_strength=1.0,
                num_steps=10, mc_batch_size=16, x_shape=(5, 5, 1),
                y_shape=(5, 5, 1))
    key = jax.random.PRNGKey(11)

    unguided = jax.jit(make_guided_sampler(
        fm, fm, GuidedSamplerConfig(**{**base, "guidance_method": "none"})),
        static_argnums=(1,))
    ux, _, _ = unguided(key, 6)

    def run(ess_floor):
        cfg = GuidedSamplerConfig(**base, ess_floor=ess_floor)
        s = jax.jit(make_guided_sampler(fm, fm, cfg, spiky_log_ratio),
                    static_argnums=(1,))
        x, _, diags = s(key, 6)
        return np.asarray(x), np.asarray(diags["ess"])

    x_plain, ess = run(None)
    x_floored, _ = run(8.0)

    # weights really are collapsed (ESS ~ 1 once guidance is active)
    assert ess[2:].max() < 1.5
    # floored trajectories stay near the unguided flow; unfloored do not.
    # The damping is continuous (gamma_eff = gamma*ESS/floor = gamma/8 at
    # ESS=1), so expect an order-of-magnitude reduction, not exact zero.
    d_plain = float(np.mean((x_plain - np.asarray(ux)) ** 2))
    d_floored = float(np.mean((x_floored - np.asarray(ux)) ** 2))
    assert d_floored < 0.15 * d_plain
