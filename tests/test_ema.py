"""EMA (Polyak averaging) of FM weights — train/steps.py + loop wiring.

The reference has no EMA; this is a production-quality capability: the
averaged weights are written alongside every best checkpoint
(flow_x_best -> flow_x_ema_best) and loaded by the sample/evaluate CLIs
with --ema.
"""
import jax
import jax.numpy as jnp
import numpy as np

from ratio_guided_multimodal_fm_tpu.core.prng import RNG
from ratio_guided_multimodal_fm_tpu.models import FlexibleUNet
from ratio_guided_multimodal_fm_tpu.train.checkpoint import load_checkpoint
from ratio_guided_multimodal_fm_tpu.train.loop import (
    train_flow_matching_epochs,
)
from ratio_guided_multimodal_fm_tpu.train.steps import (
    create_fm_state,
    make_fm_train_step,
)

H = 8


def _model():
    return FlexibleUNet(in_channels=1, img_size=H, model_channels=8,
                        channel_mult=(1,), num_res_blocks=1, dropout=0.0)


def test_ema_update_is_polyak_average():
    model = _model()
    d = 0.75
    state = create_fm_state(model, jax.random.PRNGKey(0), (H, H, 1),
                            lr=1e-2, ema_decay=d)
    ema0 = jax.tree_util.tree_map(np.asarray, state.ema_params)
    step = make_fm_train_step(model, donate=False, ema_decay=d)
    x1 = jnp.ones((4, H, H, 1))
    state, _ = step(state, x1, jax.random.PRNGKey(1))
    want = jax.tree_util.tree_map(
        lambda e, p: d * e + (1 - d) * np.asarray(p), ema0, state.params)
    got = jax.tree_util.tree_map(np.asarray, state.ema_params)
    for w, g in zip(jax.tree_util.tree_leaves(want),
                    jax.tree_util.tree_leaves(got)):
        np.testing.assert_allclose(g, w, rtol=1e-6, atol=1e-7)


def test_ema_disabled_by_default():
    model = _model()
    state = create_fm_state(model, jax.random.PRNGKey(0), (H, H, 1))
    assert state.ema_params is None
    step = make_fm_train_step(model, donate=False)
    state, _ = step(state, jnp.ones((4, H, H, 1)), jax.random.PRNGKey(1))
    assert state.ema_params is None   # reference-parity path untouched


def test_epoch_driver_saves_ema_sibling(tmp_path):
    model = _model()
    d = 0.9
    state = create_fm_state(model, jax.random.PRNGKey(0), (H, H, 1),
                            lr=1e-3, ema_decay=d)
    step = make_fm_train_step(model, donate=False, ema_decay=d)
    rng = np.random.RandomState(0)
    batches = [jnp.asarray(rng.randn(8, H, H, 1).astype(np.float32))
               for _ in range(3)]
    best = str(tmp_path / "flow_x_best")
    final_state, _, _ = train_flow_matching_epochs(
        state, step, lambda e, skip=0: iter(batches[skip:]), 1, RNG(7),
        best_path=best, log_fn=lambda *_: None)
    ema_path = str(tmp_path / "flow_x_ema_best")
    restored = load_checkpoint(ema_path, target=jax.tree_util.tree_map(
        np.asarray, final_state.ema_params))
    for r, e in zip(jax.tree_util.tree_leaves(restored),
                    jax.tree_util.tree_leaves(final_state.ema_params)):
        np.testing.assert_array_equal(np.asarray(r), np.asarray(e))
    # EMA must differ from the raw params (it lags by construction)
    diffs = [float(np.max(np.abs(np.asarray(a) - np.asarray(b))))
             for a, b in zip(
                 jax.tree_util.tree_leaves(final_state.ema_params),
                 jax.tree_util.tree_leaves(final_state.params))]
    assert max(diffs) > 0

def _ratio_model():
    from ratio_guided_multimodal_fm_tpu.models import FlexibleRatioEstimator
    return FlexibleRatioEstimator(x_channels=1, y_channels=1,
                                  feature_dim=16, hidden_dim=16)


def test_ratio_ema_update_is_polyak_average():
    """RatioTrainState EMA mirrors the FM one: e' = d·e + (1-d)·p after
    the optimizer step (the saturation hedge — cli/train_ratio.py)."""
    from ratio_guided_multimodal_fm_tpu.train.steps import (
        create_ratio_state,
        make_ratio_train_step,
    )
    model = _ratio_model()
    d = 0.75
    state = create_ratio_state(model, jax.random.PRNGKey(0), (H, H, 1),
                               (H, H, 1), lr=1e-2, ema_decay=d)
    ema0 = jax.tree_util.tree_map(np.asarray, state.ema_params)
    step = make_ratio_train_step(model, "disc", donate=False, ema_decay=d)
    x = jnp.ones((4, H, H, 1))
    y = jnp.zeros((4, H, H, 1))
    is_real = jnp.array([1, 0, 1, 0], jnp.int32)
    state, _ = step(state, x, y, is_real, jax.random.PRNGKey(1))
    want = jax.tree_util.tree_map(
        lambda e, p: d * e + (1 - d) * np.asarray(p), ema0, state.params)
    got = jax.tree_util.tree_map(np.asarray, state.ema_params)
    for w, g in zip(jax.tree_util.tree_leaves(want),
                    jax.tree_util.tree_leaves(got)):
        np.testing.assert_allclose(g, w, rtol=1e-6, atol=1e-7)


def test_ratio_ema_disabled_by_default():
    from ratio_guided_multimodal_fm_tpu.train.steps import (
        create_ratio_state,
        make_ratio_train_step,
    )
    model = _ratio_model()
    state = create_ratio_state(model, jax.random.PRNGKey(0), (H, H, 1),
                               (H, H, 1))
    assert state.ema_params is None
    step = make_ratio_train_step(model, "disc", donate=False)
    state, _ = step(state, jnp.ones((4, H, H, 1)), jnp.zeros((4, H, H, 1)),
                    jnp.array([1, 0, 1, 0], jnp.int32), jax.random.PRNGKey(1))
    assert state.ema_params is None   # reference-parity path untouched


def test_ema_sibling_path_handles_underscored_dirs(tmp_path):
    """Regression: _ema_path must suffix the BASENAME, not the last '_'
    of the whole path — best_path='my_runs/best' goes to
    'my_runs/best_ema', never 'my_ema_runs/best'."""
    model = _model()
    d = 0.9
    state = create_fm_state(model, jax.random.PRNGKey(0), (H, H, 1),
                            lr=1e-3, ema_decay=d)
    step = make_fm_train_step(model, donate=False, ema_decay=d)
    rng = np.random.RandomState(0)
    batches = [jnp.asarray(rng.randn(8, H, H, 1).astype(np.float32))]
    run_dir = tmp_path / "my_runs"
    run_dir.mkdir()
    best = str(run_dir / "best")            # no underscore in the basename
    final_state, _, _ = train_flow_matching_epochs(
        state, step, lambda e, skip=0: iter(batches[skip:]), 1, RNG(7),
        best_path=best, log_fn=lambda *_: None)
    assert not (tmp_path / "my_ema_runs").exists()
    restored = load_checkpoint(str(run_dir / "best_ema"),
                               target=jax.tree_util.tree_map(
                                   np.asarray, final_state.ema_params))
    assert restored is not None
