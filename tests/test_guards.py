"""NaN guards (core/guards.py, SURVEY §5.2) — on for the suite via conftest."""
import jax
import jax.numpy as jnp
import pytest

from ratio_guided_multimodal_fm_tpu.core.guards import (
    check_finite,
    nan_checks_enabled,
)


def test_guards_enabled_in_tests():
    assert nan_checks_enabled()


def test_check_finite_passes_and_raises():
    @jax.jit
    def f(x):
        check_finite(x, "probe")
        return x * 2

    assert float(f(jnp.ones(3)).sum()) == 6.0
    with pytest.raises(Exception, match="non-finite"):
        jax.block_until_ready(f(jnp.array([1.0, jnp.nan, 3.0])))


def test_train_step_guards_nan_batch():
    """A poisoned batch must abort the FM train step, not silently corrupt
    the params."""
    import flax.linen as nn

    from ratio_guided_multimodal_fm_tpu.train.steps import (
        create_fm_state,
        make_fm_train_step,
    )

    class TinyVel(nn.Module):
        @nn.compact
        def __call__(self, x, t, deterministic=True):
            return nn.Conv(1, (3, 3), padding="SAME")(x)

    model = TinyVel()
    state = create_fm_state(model, jax.random.PRNGKey(0), (8, 8, 1))
    step = make_fm_train_step(model)

    x_ok = jnp.zeros((4, 8, 8, 1))
    state, loss = step(state, x_ok, jax.random.PRNGKey(1))
    assert jnp.isfinite(loss)

    x_bad = x_ok.at[0, 0, 0, 0].set(jnp.nan)
    with pytest.raises(Exception, match="non-finite"):
        _, loss = step(state, x_bad, jax.random.PRNGKey(2))
        jax.block_until_ready(loss)
