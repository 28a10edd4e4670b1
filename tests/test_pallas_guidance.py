"""Flash-guidance Pallas kernel vs the reference-math JAX implementation
(interpret mode on CPU). The kernel computes softmax(log r + log p) — see
ops/guidance_pallas.py for why that equals the reference's normalized
importance weights — so outputs must match mc_feng_guidance numerically,
including the fused ESS diagnostic."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ratio_guided_multimodal_fm_tpu.ops.guidance_pallas import (
    flash_guidance,
    fused_guidance_pallas,
)
from ratio_guided_multimodal_fm_tpu.sample.guided import mc_feng_guidance


def _inputs(B, N, H=4, seed=0):
    rng = np.random.RandomState(seed)
    return (jnp.array(rng.randn(B, H, H, 1).astype(np.float32)),
            jnp.array(rng.randn(B, H, H, 2).astype(np.float32)),
            jnp.array(rng.randn(N, H, H, 1).astype(np.float32)),
            jnp.array(rng.randn(N, H, H, 2).astype(np.float32)),
            jnp.array(rng.randn(N).astype(np.float32)))


@pytest.mark.parametrize("t", [0.05, 0.5, 0.95])
@pytest.mark.parametrize("B,N", [(4, 16), (64, 128), (5, 100)])
def test_flash_matches_jax(B, N, t):
    x_t, y_t, mc_x1, mc_y1, log_r = _inputs(B, N)
    gx_ref, gy_ref, diag = mc_feng_guidance(
        x_t, y_t, mc_x1, mc_y1, jnp.exp(log_r), jnp.float32(t))
    gx, gy, ess, l = flash_guidance(x_t, y_t, mc_x1, mc_y1, log_r,
                                    jnp.float32(t), interpret=True)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_ref),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gy), np.asarray(gy_ref),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(ess), np.asarray(diag["ess"]),
                               rtol=1e-3, atol=1e-4)
    # max normalized weight is 1/l in softmax form (loose: XLA may
    # rematerialize the scores with different FMA fusion between the max
    # reduction and the subtraction — a ~1ulp |s| artifact at large |s|)
    np.testing.assert_allclose(np.max(1.0 / np.asarray(l)),
                               float(diag["w_max"]), rtol=5e-3)


def test_flash_multi_tile_n_recurrence():
    """N spanning several tiles exercises the online-softmax rescaling —
    the result must not depend on the tiling."""
    B, N, t = 8, 300, 0.7
    x_t, y_t, mc_x1, mc_y1, log_r = _inputs(B, N, seed=3)
    # widen the log-ratio spread so rescaling actually fires across tiles
    log_r = log_r * 5.0
    gx_ref, gy_ref, diag = mc_feng_guidance(
        x_t, y_t, mc_x1, mc_y1, jnp.exp(log_r), jnp.float32(t))
    for tile_n in (128, 256):
        gx, gy, ess, _ = flash_guidance(x_t, y_t, mc_x1, mc_y1, log_r,
                                        jnp.float32(t), tile_n=tile_n,
                                        interpret=True)
        np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_ref),
                                   rtol=1e-3, atol=1e-4)
        np.testing.assert_allclose(np.asarray(gy), np.asarray(gy_ref),
                                   rtol=1e-3, atol=1e-4)
        np.testing.assert_allclose(np.asarray(ess), np.asarray(diag["ess"]),
                                   rtol=1e-3, atol=1e-4)


def test_legacy_ratio_surface():
    B, N, t = 4, 32, 0.5
    x_t, y_t, mc_x1, mc_y1, log_r = _inputs(B, N, seed=1)
    gx_ref, gy_ref, _ = mc_feng_guidance(
        x_t, y_t, mc_x1, mc_y1, jnp.exp(log_r), jnp.float32(t))
    gx, gy = fused_guidance_pallas(x_t, y_t, mc_x1, mc_y1, jnp.exp(log_r),
                                   jnp.float32(t), interpret=True)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_ref),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gy), np.asarray(gy_ref),
                               rtol=1e-3, atol=1e-4)


def test_full_sampler_pallas_equals_xla():
    """The guided sampler with use_pallas must produce the same trajectories
    as the XLA guidance path (same key, same toy models)."""
    from ratio_guided_multimodal_fm_tpu.sample.guided import (
        GuidedSamplerConfig,
        make_guided_sampler,
    )

    fm = lambda x, t: -0.1 * x  # noqa: E731
    log_ratio = lambda x, y: -(  # noqa: E731
        jnp.mean(x.reshape(x.shape[0], -1), axis=1)
        - jnp.mean(y.reshape(y.shape[0], -1), axis=1)) ** 2

    kw = dict(guidance_method="mc_feng", guidance_strength=0.5, num_steps=6,
              mc_batch_size=16, x_shape=(4, 4, 1), y_shape=(4, 4, 2))
    s_xla = jax.jit(make_guided_sampler(
        fm, fm, GuidedSamplerConfig(**kw), log_ratio), static_argnums=(1,))
    s_pal = jax.jit(make_guided_sampler(
        fm, fm, GuidedSamplerConfig(use_pallas="interpret", **kw),
        log_ratio), static_argnums=(1,))

    key = jax.random.PRNGKey(7)
    x_a, y_a, d_a = s_xla(key, 4)
    x_b, y_b, d_b = s_pal(key, 4)
    np.testing.assert_allclose(np.asarray(x_b), np.asarray(x_a),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(y_b), np.asarray(y_a),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(d_b["ess"]),
                               np.asarray(d_a["ess"]),
                               rtol=1e-3, atol=1e-3)
    assert d_b["w_max"].shape == (6,)
