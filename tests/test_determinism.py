"""Reproducibility: identical keys → identical samples (the JAX-native
replacement for the reference's cudnn-determinism knobs, SURVEY §4.4)."""
import jax
import jax.numpy as jnp
import numpy as np

from ratio_guided_multimodal_fm_tpu.sample.guided import (
    GuidedSamplerConfig,
    make_guided_sampler,
)


def test_sampler_deterministic():
    fm = lambda x, t: -0.1 * x
    log_ratio = lambda x, y: -jnp.mean(
        (x.reshape(x.shape[0], -1) - y.reshape(y.shape[0], -1)) ** 2, axis=1)
    cfg = GuidedSamplerConfig("mc_feng", 0.7, 8, 16, (6, 6, 1), (6, 6, 1))
    sampler = jax.jit(make_guided_sampler(fm, fm, cfg, log_ratio),
                      static_argnums=(1,))
    a = sampler(jax.random.PRNGKey(5), 4)
    b = sampler(jax.random.PRNGKey(5), 4)
    np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))
    np.testing.assert_array_equal(np.asarray(a[1]), np.asarray(b[1]))
    c = sampler(jax.random.PRNGKey(6), 4)
    assert not np.array_equal(np.asarray(a[0]), np.asarray(c[0]))


def test_train_step_deterministic():
    from ratio_guided_multimodal_fm_tpu.models import FlexibleUNet
    from ratio_guided_multimodal_fm_tpu.train.steps import (
        create_fm_state,
        make_fm_train_step,
    )

    model = FlexibleUNet(in_channels=1, img_size=8, model_channels=8,
                         channel_mult=(1, 2), num_res_blocks=1)
    x1 = jax.random.normal(jax.random.PRNGKey(0), (8, 8, 8, 1))

    def run():
        state = create_fm_state(model, jax.random.PRNGKey(1), (8, 8, 1))
        step = make_fm_train_step(model, donate=False)
        for i in range(3):
            state, loss = step(state, x1, jax.random.PRNGKey(100 + i))
        return float(loss)

    assert run() == run()
