"""Golden param-count and output-shape tests.

Param counts must equal the values measured from the reference's own
self-tests (BASELINE.md table) — same architectures, so identical counts.
Shape checks mirror the reference's __main__ smoke blocks (SURVEY §4.1).
"""
import jax
import jax.numpy as jnp
import pytest

from ratio_guided_multimodal_fm_tpu.models import (
    FlexibleUNet,
    FlowMatchingModel,
    FlowMatchingUNetMNIST,
    FlowMatchingUNetSVHN,
    MNISTClassifier,
    MNISTClassifier32,
    RatioEstimatorMNIST,
    RatioEstimatorMNISTSVHN,
    SVHNClassifier,
)

K = jax.random.PRNGKey(0)


def n_params(shapes_tree):
    leaves = jax.tree_util.tree_leaves(shapes_tree)
    return sum(int(jnp.prod(jnp.array(x.shape))) for x in leaves)


def param_count(model, *args, **kw):
    shapes = jax.eval_shape(lambda *a: model.init(K, *a, **kw), *args)
    return n_params(shapes["params"])


S = jax.ShapeDtypeStruct
X28 = S((2, 28, 28, 1), jnp.float32)
X32 = S((2, 32, 32, 1), jnp.float32)
Y32 = S((2, 32, 32, 3), jnp.float32)
T = S((2,), jnp.float32)


@pytest.mark.parametrize(
    "model,args,expected",
    [
        (FlowMatchingUNetMNIST(28), (X28, T), 901_121),
        (FlowMatchingUNetMNIST(32), (X32, T), 901_121),
        (FlowMatchingUNetSVHN(), (Y32, T), 6_074_371),
        (FlowMatchingModel(), (X28, T), 9_104_513),
        (RatioEstimatorMNIST(), (X28, X28), 943_745),
        (RatioEstimatorMNISTSVHN(), (X32, Y32), 3_327_617),
        (MNISTClassifier(), (X28,), 421_642),
        (MNISTClassifier32(), (X32,), 581_450),
        (SVHNClassifier(), (Y32,), 2_341_514),
    ],
    ids=["unet28", "unet32", "unet_svhn", "fm_orig", "ratio_mnist",
         "ratio_ms", "clf28", "clf32", "clf_svhn"],
)
def test_param_parity(model, args, expected):
    assert param_count(model, *args) == expected


def test_unet_forward_shape_tiny():
    """Tiny config forward: output shape == input shape, finite values."""
    m = FlexibleUNet(in_channels=1, img_size=8, model_channels=8,
                     channel_mult=(1, 2), num_res_blocks=1, dropout=0.0)
    x = jnp.ones((2, 8, 8, 1))
    t = jnp.array([0.1, 0.9])
    params = m.init(K, x, t)
    out = m.apply(params, x, t)
    assert out.shape == x.shape
    assert jnp.all(jnp.isfinite(out))


def test_unet_zero_init_output():
    """Output conv is zero-init (ref unet_flexible.py:199-201): initial v == 0."""
    m = FlexibleUNet(in_channels=1, img_size=8, model_channels=8,
                     channel_mult=(1, 2), num_res_blocks=1, dropout=0.0)
    x = jax.random.normal(K, (2, 8, 8, 1))
    t = jnp.array([0.3, 0.7])
    params = m.init(K, x, t)
    out = m.apply(params, x, t)
    assert jnp.allclose(out, 0.0)


def test_ratio_log_ratio_shapes():
    m = RatioEstimatorMNIST(loss_type="disc")
    x = jax.random.normal(K, (3, 28, 28, 1))
    y = jax.random.normal(K, (3, 28, 28, 1))
    params = m.init(K, x, y)
    s = m.apply(params, x, y)
    lr = m.apply(params, x, y, method=m.log_ratio)
    assert s.shape == (3,)
    assert lr.shape == (3,)
    # disc: log_ratio == scores exactly
    assert jnp.allclose(lr, s)


def test_ratio_rulsif_log_ratio():
    m = RatioEstimatorMNIST(loss_type="rulsif")
    x = jax.random.normal(K, (3, 28, 28, 1))
    y = jax.random.normal(K, (3, 28, 28, 1))
    params = m.init(K, x, y)
    s = m.apply(params, x, y)
    lr = m.apply(params, x, y, method=m.log_ratio)
    expected = jnp.log(jax.nn.softplus(s) + 1e-8)
    assert jnp.allclose(lr, expected, atol=1e-6)
