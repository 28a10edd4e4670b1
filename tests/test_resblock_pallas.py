"""Fused GN+SiLU+conv3x3 mega-kernel (ops/resblock_pallas.py) vs the XLA
reference — interpret mode on CPU (the TPU timing verdict lives in
scripts/resblock_kernel_bench.py / docs/results_r5)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ratio_guided_multimodal_fm_tpu.ops.resblock_pallas import (
    fused_gn_silu_conv,
    reference_gn_silu_conv,
)


def _inputs(B, H, W, C, O, seed=0, dtype=jnp.float32):
    r = np.random.RandomState(seed)
    x = jnp.asarray(r.randn(B, H, W, C), dtype)
    sc = jnp.asarray(1.0 + 0.1 * r.randn(C), jnp.float32)
    bi = jnp.asarray(0.1 * r.randn(C), jnp.float32)
    w = jnp.asarray(0.2 * r.randn(3, 3, C, O), jnp.float32)
    cb = jnp.asarray(0.1 * r.randn(O), jnp.float32)
    return x, sc, bi, w, cb


@pytest.mark.parametrize("shape", [(4, 8, 8, 16, 16), (3, 8, 4, 8, 24)])
def test_fused_matches_reference(shape):
    B, H, W, C, O = shape
    x, sc, bi, w, cb = _inputs(B, H, W, C, O)
    got = fused_gn_silu_conv(x, sc, bi, w, cb, groups=4, tile_b=2,
                             interpret=True)
    want = reference_gn_silu_conv(x, sc, bi, w, cb, groups=4)
    assert got.shape == want.shape == (B, H, W, O)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_fused_bf16_close_to_f32_reference():
    B, H, W, C, O = 2, 8, 8, 16, 16
    x, sc, bi, w, cb = _inputs(B, H, W, C, O, seed=1)
    got = fused_gn_silu_conv(x.astype(jnp.bfloat16), sc, bi, w, cb,
                             groups=4, tile_b=2, interpret=True)
    want = reference_gn_silu_conv(x, sc, bi, w, cb, groups=4)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want), rtol=0.1, atol=0.15)


def test_nondividing_batch_padding():
    B, H, W, C, O = 5, 4, 4, 8, 8          # tile_b=2 → pad to 6
    x, sc, bi, w, cb = _inputs(B, H, W, C, O, seed=2)
    got = fused_gn_silu_conv(x, sc, bi, w, cb, groups=2, tile_b=2,
                             interpret=True)
    want = reference_gn_silu_conv(x, sc, bi, w, cb, groups=2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_rejects_bad_shapes():
    x, sc, bi, w, cb = _inputs(2, 4, 4, 8, 8)
    with pytest.raises(ValueError):
        fused_gn_silu_conv(x, sc, bi, w, cb, groups=3, interpret=True)
    with pytest.raises(ValueError):
        fused_gn_silu_conv(x, sc, bi, jnp.zeros((5, 5, 8, 8)), cb,
                           groups=2, interpret=True)
