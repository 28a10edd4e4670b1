"""MC-set caching: passing a precomputed set must match the key-derived
phase-A generation exactly (same key streams)."""
import jax
import jax.numpy as jnp
import numpy as np

from ratio_guided_multimodal_fm_tpu.flow.cfm import euler_sample
from ratio_guided_multimodal_fm_tpu.sample.guided import (
    GuidedSamplerConfig,
    make_guided_sampler,
)


def test_mc_set_passthrough_matches_internal_generation():
    fm = lambda x, t: -0.2 * x
    log_ratio = lambda x, y: -jnp.mean(
        (x.reshape(x.shape[0], -1) - y.reshape(y.shape[0], -1)) ** 2, axis=1)
    cfg = GuidedSamplerConfig("mc_feng", 0.6, 8, 16, (4, 4, 1), (4, 4, 1))
    sampler = jax.jit(make_guided_sampler(fm, fm, cfg, log_ratio),
                      static_argnums=(1,))
    key = jax.random.PRNGKey(3)

    # internal phase A
    x_a, y_a, _ = sampler(key, 4)

    # reproduce phase A externally with the sampler's own key splits
    _, _, kmx, kmy = jax.random.split(key, 4)
    mc_x1 = euler_sample(fm, kmx, (16, 4, 4, 1), 8)
    mc_y1 = euler_sample(fm, kmy, (16, 4, 4, 1), 8)
    mc_r = jnp.exp(log_ratio(mc_x1, mc_y1))
    x_b, y_b, _ = sampler(key, 4, (mc_x1, mc_y1, mc_r))

    np.testing.assert_allclose(np.asarray(x_a), np.asarray(x_b),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(y_a), np.asarray(y_b),
                               rtol=1e-6, atol=1e-6)
