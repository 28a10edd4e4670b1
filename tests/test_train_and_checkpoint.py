"""Train-step + checkpoint round-trip tests (tiny models, CPU)."""
import os

import jax
import jax.numpy as jnp
import numpy as np

from ratio_guided_multimodal_fm_tpu.models import FlexibleUNet, FlexibleRatioEstimator
from ratio_guided_multimodal_fm_tpu.train.checkpoint import (
    get_checkpoint_path,
    load_params,
    save_checkpoint,
    save_train_checkpoint,
    load_checkpoint,
)
from ratio_guided_multimodal_fm_tpu.train.steps import (
    create_fm_state,
    create_ratio_state,
    make_fm_train_step,
    make_ratio_train_step,
)

TINY = dict(in_channels=1, img_size=8, model_channels=8, channel_mult=(1, 2),
            num_res_blocks=1, dropout=0.1)


def test_fm_train_step_decreases_loss():
    model = FlexibleUNet(**TINY)
    state = create_fm_state(model, jax.random.PRNGKey(0), (8, 8, 1), lr=1e-3)
    step = make_fm_train_step(model, donate=False)
    x1 = jax.random.normal(jax.random.PRNGKey(1), (32, 8, 8, 1)) * 0.5
    losses = []
    for i in range(30):
        state, loss = step(state, x1, jax.random.PRNGKey(10 + i))
        losses.append(float(loss))
    assert np.mean(losses[-5:]) < np.mean(losses[:5])


def _blob_batch(rng, n, H=8):
    """Class-structured pairs: class 0 = top-left blob, class 1 = bottom-right.
    Real pair = same class; fake = opposite class (learnable from pooled
    conv features, unlike pixel-matching random noise)."""
    cls = rng.randint(0, 2, n)
    def blob(c_arr):
        out = np.full((len(c_arr), H, H, 1), -0.5, np.float32)
        for i, c in enumerate(c_arr):
            if c == 0:
                out[i, :3, :3, 0] = 1.0
            else:
                out[i, H - 3:, H - 3:, 0] = 1.0
        return out + rng.randn(len(c_arr), H, H, 1).astype(np.float32) * 0.1
    is_real = (rng.rand(n) < 0.5)
    y_cls = np.where(is_real, cls, 1 - cls)
    return blob(cls), blob(y_cls), is_real.astype(np.float32)


def test_ratio_train_step_learns_separation():
    model = FlexibleRatioEstimator(x_channels=1, y_channels=1,
                                   feature_dim=32, hidden_dim=64)
    state = create_ratio_state(model, jax.random.PRNGKey(0), (8, 8, 1),
                               (8, 8, 1), lr=3e-3)
    step = make_ratio_train_step(model, "disc", donate=False)
    rng = np.random.RandomState(0)
    for i in range(60):
        x, y, m = _blob_batch(rng, 64)
        state, metrics = step(state, jnp.array(x), jnp.array(y), jnp.array(m),
                              jax.random.PRNGKey(i))
    assert float(metrics["acc_real"]) > 0.8
    assert float(metrics["acc_fake"]) > 0.8


def test_checkpoint_roundtrip_params(tmp_path):
    model = FlexibleUNet(**TINY)
    state = create_fm_state(model, jax.random.PRNGKey(0), (8, 8, 1))
    path = get_checkpoint_path("flow", "x", None, "best", base_dir=str(tmp_path))
    assert path.endswith("flow_x_best")  # None parts dropped (ref semantics)
    save_checkpoint(path, state.params)

    template = create_fm_state(model, jax.random.PRNGKey(7), (8, 8, 1)).params
    restored = load_params(path, template)
    for a, b in zip(jax.tree_util.tree_leaves(restored),
                    jax.tree_util.tree_leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_checkpoint_full_dict_roundtrip(tmp_path):
    """Dual-format semantics: full dict restores params + epoch + best_loss,
    and load_params unwraps it (ref utils/__init__.py:25-51)."""
    model = FlexibleUNet(**TINY)
    state = create_fm_state(model, jax.random.PRNGKey(0), (8, 8, 1))
    path = os.path.join(str(tmp_path), "full")
    save_train_checkpoint(path, state, epoch=7, best_loss=0.123)

    tree = load_checkpoint(path)
    assert int(tree["epoch"]) == 7
    assert abs(float(tree["best_loss"]) - 0.123) < 1e-9

    restored = load_params(path, state.params)  # unwraps 'params'
    leaves_a = jax.tree_util.tree_leaves(restored)
    leaves_b = jax.tree_util.tree_leaves(state.params)
    assert len(leaves_a) == len(leaves_b)


def test_ratio_state_with_batch_stats(tmp_path):
    from ratio_guided_multimodal_fm_tpu.models import RatioEstimatorMNISTSVHN

    model = RatioEstimatorMNISTSVHN(feature_dim=16, hidden_dim=32)
    state = create_ratio_state(model, jax.random.PRNGKey(0), (32, 32, 1),
                               (32, 32, 3), has_batch_stats=True)
    assert state.batch_stats is not None
    step = make_ratio_train_step(model, "disc", has_batch_stats=True,
                                 donate=False)
    x = jnp.zeros((4, 32, 32, 1))
    y = jnp.zeros((4, 32, 32, 3))
    m = jnp.array([1.0, 1.0, 0.0, 0.0])
    state2, metrics = step(state, x, y, m, jax.random.PRNGKey(1))
    # batch_stats updated
    a = jax.tree_util.tree_leaves(state.batch_stats)
    b = jax.tree_util.tree_leaves(state2.batch_stats)
    assert any(not np.allclose(np.asarray(x1), np.asarray(y1))
               for x1, y1 in zip(a, b))


def test_load_params_rejects_structure_mismatch(tmp_path):
    """A checkpoint with the same leaf COUNT but different key paths or
    shapes must be refused, not silently conformed (round-1 finding)."""
    import numpy as np
    import pytest

    from ratio_guided_multimodal_fm_tpu.train.checkpoint import (
        load_params,
        save_checkpoint,
    )

    good = {"dense": {"kernel": np.ones((3, 4), np.float32),
                      "bias": np.zeros((4,), np.float32)}}
    path = str(tmp_path / "ckpt_struct")
    save_checkpoint(path, good)

    # same leaf count, different key names
    bad_names = {"dense": {"w": np.ones((3, 4), np.float32),
                           "b": np.zeros((4,), np.float32)}}
    with pytest.raises(ValueError, match="does not match"):
        load_params(path, bad_names)

    # same structure, different shapes
    bad_shapes = {"dense": {"kernel": np.ones((4, 3), np.float32),
                            "bias": np.zeros((4,), np.float32)}}
    with pytest.raises(ValueError, match="shape mismatch"):
        load_params(path, bad_shapes)

    restored = load_params(path, good)
    np.testing.assert_array_equal(restored["dense"]["kernel"],
                                  good["dense"]["kernel"])
