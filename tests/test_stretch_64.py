"""64x64 cross-modal stretch config (BASELINE.json config #5): models build,
forward, and the guided sampler runs at 64x64 RGB x RGB."""
import jax
import jax.numpy as jnp
import numpy as np

from ratio_guided_multimodal_fm_tpu.models import FlexibleRatioEstimator
from ratio_guided_multimodal_fm_tpu.models.unet import FlowMatchingUNet64
from ratio_guided_multimodal_fm_tpu.sample.guided import (
    GuidedSamplerConfig,
    make_guided_sampler,
)

K = jax.random.PRNGKey(0)


def test_unet64_shapes():
    m = FlowMatchingUNet64(in_channels=3)
    shapes = jax.eval_shape(
        lambda: m.init(K, jnp.zeros((1, 64, 64, 3)), jnp.zeros((1,))))
    n = sum(int(np.prod(x.shape))
            for x in jax.tree_util.tree_leaves(shapes["params"]))
    assert n > 10_000_000  # a real 64px model, bigger than the SVHN net


def test_ratio64_and_sampler_run():
    """Tiny-channel 64px variants end-to-end through the guided sampler."""
    fm = lambda x, t: -0.05 * x  # stand-in velocity fields (architecture
    # coverage for 64px models is test_unet64_shapes; this exercises the
    # sampler's shape-genericity at 64x64 RGB)
    ratio = FlexibleRatioEstimator(x_channels=3, y_channels=3,
                                   feature_dim=32, hidden_dim=64)
    rv = ratio.init(K, jnp.zeros((1, 64, 64, 3)), jnp.zeros((1, 64, 64, 3)))
    log_ratio = lambda x, y: ratio.apply(rv, x, y, method=ratio.log_ratio)

    cfg = GuidedSamplerConfig(
        guidance_method="mc_feng", guidance_strength=0.5, num_steps=4,
        mc_batch_size=8, x_shape=(64, 64, 3), y_shape=(64, 64, 3))
    sampler = jax.jit(make_guided_sampler(fm, fm, cfg, log_ratio),
                      static_argnums=(1,))
    x1, y1, _ = sampler(jax.random.PRNGKey(1), 2)
    assert x1.shape == (2, 64, 64, 3)
    assert np.isfinite(np.asarray(x1)).all()
