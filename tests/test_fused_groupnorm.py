"""FusedGroupNorm (models/layers.py) vs nn.GroupNorm: identical params,
identical numerics on both the XLA path and the Pallas kernel (interpret
mode on CPU), and unchanged U-Net param trees so round-1/2 checkpoints
load as-is."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from ratio_guided_multimodal_fm_tpu.models.layers import (
    FusedGroupNorm,
    set_gn_impl,
)


@pytest.fixture(autouse=True)
def _restore_impl():
    yield
    set_gn_impl("auto")


def _pair(C=64, g=8, B=4, H=8, dtype=jnp.float32, seed=0):
    x = jax.random.normal(jax.random.PRNGKey(seed), (B, H, H, C), dtype)
    gn = nn.GroupNorm(num_groups=g, dtype=dtype)
    # random affine so scale/bias actually matter
    p = {"params": {"scale": jax.random.uniform(
            jax.random.PRNGKey(1), (C,), jnp.float32, 0.5, 1.5),
         "bias": jax.random.normal(jax.random.PRNGKey(2), (C,)) * 0.1}}
    fgn = FusedGroupNorm(num_groups=g, fuse_silu=True, dtype=dtype)
    return x, gn, fgn, p


def test_param_structure_matches_nn_groupnorm():
    x, gn, fgn, _ = _pair()
    p_ref = gn.init(jax.random.PRNGKey(0), x)["params"]
    p_new = fgn.init(jax.random.PRNGKey(0), x)["params"]
    assert set(p_ref) == set(p_new) == {"scale", "bias"}
    assert p_ref["scale"].shape == p_new["scale"].shape


def test_xla_path_matches_flax_f32():
    set_gn_impl("flax")
    x, gn, fgn, p = _pair()
    ref = nn.silu(gn.apply(p, x))
    np.testing.assert_allclose(np.asarray(fgn.apply(p, x)),
                               np.asarray(ref), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("C,g", [(64, 8), (32, 8), (128, 8), (8, 8)])
def test_pallas_kernel_matches_flax(C, g):
    set_gn_impl("interpret")
    x, gn, fgn, p = _pair(C=C, g=g)
    ref = nn.silu(gn.apply(p, x))
    np.testing.assert_allclose(np.asarray(fgn.apply(p, x)),
                               np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_pallas_kernel_bf16_close():
    set_gn_impl("interpret")
    x, gn, fgn, p = _pair(dtype=jnp.bfloat16)
    ref = nn.silu(gn.apply(p, x)).astype(np.float32)
    got = np.asarray(fgn.apply(p, x)).astype(np.float32)
    np.testing.assert_allclose(got, ref, rtol=0.05, atol=0.05)


def test_pallas_kernel_odd_batch_padding():
    """B not divisible by the tile -> padded grid, exact result."""
    set_gn_impl("interpret")
    x, gn, fgn, p = _pair(B=5)
    ref = nn.silu(gn.apply(p, x))
    np.testing.assert_allclose(np.asarray(fgn.apply(p, x)),
                               np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_unet_param_tree_and_count_unchanged():
    from ratio_guided_multimodal_fm_tpu.models import FlowMatchingUNetSVHN

    fm = FlowMatchingUNetSVHN()
    params = fm.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)),
                     jnp.zeros((1,)))["params"]
    assert {"GroupNorm_0", "GroupNorm_1"} <= set(params["enc_0"])
    n = sum(int(np.prod(a.shape))
            for a in jax.tree_util.tree_leaves(params))
    assert n == 6_074_371          # BASELINE.md measured value


def test_unet_forward_same_across_impls():
    """The whole U-Net forward must agree between GN implementations."""
    from ratio_guided_multimodal_fm_tpu.models import FlowMatchingUNetMNIST

    fm = FlowMatchingUNetMNIST(img_size=32)
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 32, 32, 1))
    t = jnp.array([0.2, 0.8])
    params = fm.init(jax.random.PRNGKey(0), x, t)
    set_gn_impl("flax")
    a = fm.apply(params, x, t)
    set_gn_impl("interpret")
    b = fm.apply(params, x, t)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-4, atol=1e-4)
