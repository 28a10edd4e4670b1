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


def test_sampler_merged_path_matches_separate():
    """End-to-end: sample_bimodal_guided with fm_pair_fn (merged grouped-conv
    evaluation, wired by cli/common.py:maybe_merged_pair_fn) must reproduce
    the per-net path bit-for-bit-ish on both phases (MC set + main ODE)."""
    from ratio_guided_multimodal_fm_tpu.sample.guided import (
        sample_bimodal_guided,
    )

    model = FlexibleUNet(in_channels=1, img_size=8, model_channels=8,
                         channel_mult=(1, 2), num_res_blocks=1)
    px = _init(model, jax.random.PRNGKey(0), 8, 1)
    py = _init(model, jax.random.PRNGKey(1), 8, 1)
    fx = lambda x, t: model.apply({"params": px}, x, t)    # noqa: E731
    fy = lambda y, t: model.apply({"params": py}, y, t)    # noqa: E731
    mf = make_merged_velocity_fn(model)
    merged = merge_unet_params(px, py)
    fpair = lambda x, y, t: mf(merged, x, y, t)            # noqa: E731
    log_ratio = lambda a, b: jnp.sum(a * b, axis=(1, 2, 3))  # noqa: E731

    kw = dict(log_ratio_fn=log_ratio, guidance_method="mc_feng",
              guidance_strength=0.7, num_samples=4, num_steps=6,
              mc_batch_size=8, x_shape=(8, 8, 1), y_shape=(8, 8, 1),
              key=jax.random.PRNGKey(5))
    xs_ref, ys_ref = sample_bimodal_guided(fx, fy, **kw)
    xs, ys = sample_bimodal_guided(fx, fy, fm_pair_fn=fpair, **kw)
    np.testing.assert_allclose(np.asarray(xs), np.asarray(xs_ref),
                               rtol=0, atol=5e-5)
    np.testing.assert_allclose(np.asarray(ys), np.asarray(ys_ref),
                               rtol=0, atol=5e-5)


def test_maybe_merged_pair_fn_gating():
    """cli/common.py helper: merged evaluation is OPT-IN (--merged_unet;
    it measured slower on v5e) and still refuses mismatched topologies;
    when enabled it returns a working (x, y, t) -> (v_x, v_y) closure."""
    import argparse

    from ratio_guided_multimodal_fm_tpu.cli.common import (
        maybe_merged_pair_fn,
    )

    model = FlexibleUNet(in_channels=1, img_size=8, model_channels=8,
                         channel_mult=(1, 2), num_res_blocks=1)
    px = _init(model, jax.random.PRNGKey(0), 8, 1)
    py = _init(model, jax.random.PRNGKey(1), 8, 1)

    # default (flag absent or False) -> separate evaluation
    assert maybe_merged_pair_fn(model, model, px, py, None) is None
    assert maybe_merged_pair_fn(
        model, model, px, py, argparse.Namespace(merged_unet=False)) is None
    # opt-in but mismatched topology -> refused
    assert maybe_merged_pair_fn(model, FlowMatchingUNetSVHN(), px, py,
                                argparse.Namespace(merged_unet=True)) \
        is None

    f = maybe_merged_pair_fn(model, model, px, py,
                             argparse.Namespace(merged_unet=True))
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 8, 8, 1))
    t = jnp.array([0.2, 0.8])
    vx, vy = f(x, x, t)
    np.testing.assert_allclose(
        np.asarray(vx), np.asarray(model.apply({"params": px}, x, t)),
        rtol=0, atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(vy), np.asarray(model.apply({"params": py}, x, t)),
        rtol=0, atol=2e-5)


def test_merged_respects_norm_eps():
    """Torch-exact imports build nets with norm_eps=1e-5; the merged path
    must use the models' eps, not a hardcoded 1e-6 (and refuse to merge
    nets whose epsilons differ)."""
    mk = lambda eps: FlexibleUNet(in_channels=1, img_size=16,
                                  model_channels=8, channel_mult=(1, 2),
                                  num_res_blocks=1, norm_eps=eps)
    mx, my = mk(1e-5), mk(1e-5)
    assert can_merge(mx, my)
    assert not can_merge(mx, mk(1e-6))

    px = _init(mx, jax.random.PRNGKey(0), 16, 1)
    py = _init(my, jax.random.PRNGKey(1), 16, 1)
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 16, 16, 1))
    y = jax.random.normal(jax.random.PRNGKey(3), (2, 16, 16, 1))
    t = jnp.array([0.2, 0.8])
    vx_ref = mx.apply({"params": px}, x, t)
    vy_ref = my.apply({"params": py}, y, t)
    vx, vy = make_merged_velocity_fn(mx)(merge_unet_params(px, py), x, y, t)
    np.testing.assert_allclose(np.asarray(vx), np.asarray(vx_ref),
                               rtol=0, atol=2e-5)
    np.testing.assert_allclose(np.asarray(vy), np.asarray(vy_ref),
                               rtol=0, atol=2e-5)
