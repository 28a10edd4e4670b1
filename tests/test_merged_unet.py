"""Merged-pair U-Net (models/merged.py): grouped-conv evaluation of two
same-topology FlexibleUNets must equal per-net evaluation exactly."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ratio_guided_multimodal_fm_tpu.models.merged import (
    can_merge,
    make_merged_velocity_fn,
    merge_unet_params,
    merged_pair_apply,
)
from ratio_guided_multimodal_fm_tpu.models.unet import (
    FlexibleUNet,
    FlowMatchingUNet,
    FlowMatchingUNetSVHN,
)


def _init(model, key, hw, cin):
    return model.init(key, jnp.zeros((1, hw, hw, cin)),
                      jnp.zeros((1,)))["params"]


@pytest.mark.parametrize("split_skip", [True, False])
def test_merged_equals_separate_parity_net(split_skip):
    mx = FlowMatchingUNet(split_skip=split_skip)
    my = FlowMatchingUNet(split_skip=split_skip)
    assert can_merge(mx, my)
    px = _init(mx, jax.random.PRNGKey(0), 28, 1)
    py = _init(my, jax.random.PRNGKey(1), 28, 1)

    x = jax.random.normal(jax.random.PRNGKey(2), (4, 28, 28, 1))
    y = jax.random.normal(jax.random.PRNGKey(3), (4, 28, 28, 1))
    t = jnp.linspace(0.1, 0.9, 4)

    vx_ref = mx.apply({"params": px}, x, t)
    vy_ref = my.apply({"params": py}, y, t)

    fn = make_merged_velocity_fn(mx)
    vx, vy = fn(merge_unet_params(px, py), x, y, t)
    np.testing.assert_allclose(np.asarray(vx), np.asarray(vx_ref),
                               rtol=0, atol=2e-5)
    np.testing.assert_allclose(np.asarray(vy), np.asarray(vy_ref),
                               rtol=0, atol=2e-5)


def test_merged_three_level_net():
    """Deeper topology (SVHN shape): 3 levels, channel mult (1,2,2)."""
    mk = lambda: FlexibleUNet(in_channels=3, img_size=32, model_channels=16,
                              channel_mult=(1, 2, 2), num_res_blocks=2)
    mx, my = mk(), mk()
    px = _init(mx, jax.random.PRNGKey(0), 32, 3)
    py = _init(my, jax.random.PRNGKey(1), 32, 3)
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 32, 32, 3))
    y = jax.random.normal(jax.random.PRNGKey(3), (2, 32, 32, 3))
    t = jnp.array([0.25, 0.75])
    vx_ref = mx.apply({"params": px}, x, t)
    vy_ref = my.apply({"params": py}, y, t)
    vx, vy = merged_pair_apply(mx)(px, py, x, y, t)
    np.testing.assert_allclose(np.asarray(vx), np.asarray(vx_ref),
                               rtol=0, atol=2e-5)
    np.testing.assert_allclose(np.asarray(vy), np.asarray(vy_ref),
                               rtol=0, atol=2e-5)


def test_can_merge_rejects_mismatched_topology():
    assert not can_merge(FlowMatchingUNet(), FlowMatchingUNetSVHN())
    assert not can_merge(FlowMatchingUNet(), object())
