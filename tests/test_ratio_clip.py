"""log-ratio clip: guards against saturated-discriminator weight collapse."""
import jax
import jax.numpy as jnp
import numpy as np

from ratio_guided_multimodal_fm_tpu.sample.guided import (
    GuidedSamplerConfig,
    generate_mc_set,
    make_guided_sampler,
)


def test_generate_mc_set_clip():
    fm = lambda x, t: jnp.zeros_like(x)
    # log-ratio returns huge values → unclipped ratios overflow-ish
    log_ratio = lambda x, y: 50.0 * jnp.ones(x.shape[0])
    _, _, r = generate_mc_set(fm, fm, log_ratio, jax.random.PRNGKey(0), 8,
                              (4, 4, 1), (4, 4, 1), 4, log_ratio_clip=3.0)
    np.testing.assert_allclose(np.asarray(r), np.exp(3.0), rtol=1e-6)


def test_clip_prevents_single_sample_collapse():
    """One MC sample with an extreme ratio dominates the weights without the
    clip; with it, guidance stays a broad mixture."""
    fm = lambda x, t: jnp.zeros_like(x)

    def spiky_log_ratio(x, y):
        n = x.shape[0]
        return jnp.concatenate([jnp.array([80.0]), jnp.zeros(n - 1)])

    def run(clip):
        cfg = GuidedSamplerConfig("mc_feng", 1.0, num_steps=6,
                                  mc_batch_size=16, x_shape=(4, 4, 1),
                                  y_shape=(4, 4, 1), log_ratio_clip=clip)
        sampler = jax.jit(make_guided_sampler(fm, fm, cfg, spiky_log_ratio),
                          static_argnums=(1,))
        _, _, diags = sampler(jax.random.PRNGKey(1), 4)
        # early step (t small, p_t broad): weights reflect the ratios, so
        # this is where saturation-collapse shows. (At t→1 concentration on
        # the nearest sample is correct ODE behavior regardless of clip.)
        return float(diags["w_max"][1])

    assert run(None) > 0.97          # collapse onto the spike
    assert run(2.0) < 0.9            # clip keeps a mixture
