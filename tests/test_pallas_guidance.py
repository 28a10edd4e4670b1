"""Pallas fused guidance kernel vs the reference-math JAX implementation
(interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ratio_guided_multimodal_fm_tpu.ops.guidance_pallas import (
    fused_guidance_pallas,
)
from ratio_guided_multimodal_fm_tpu.sample.guided import mc_feng_guidance


@pytest.mark.parametrize("t", [0.05, 0.5, 0.95])
@pytest.mark.parametrize("B,N", [(4, 16), (64, 128), (5, 100)])
def test_pallas_matches_jax(B, N, t):
    rng = np.random.RandomState(0)
    H = 4
    x_t = jnp.array(rng.randn(B, H, H, 1).astype(np.float32))
    y_t = jnp.array(rng.randn(B, H, H, 2).astype(np.float32))
    mc_x1 = jnp.array(rng.randn(N, H, H, 1).astype(np.float32))
    mc_y1 = jnp.array(rng.randn(N, H, H, 2).astype(np.float32))
    mc_r = jnp.array(np.exp(rng.randn(N)).astype(np.float32))

    gx_ref, gy_ref, _ = mc_feng_guidance(x_t, y_t, mc_x1, mc_y1, mc_r,
                                         jnp.float32(t))
    gx, gy = fused_guidance_pallas(x_t, y_t, mc_x1, mc_y1, mc_r,
                                   jnp.float32(t), interpret=True)

    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_ref),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gy), np.asarray(gy_ref),
                               rtol=1e-3, atol=1e-4)
