"""split_skip decoder (layers._SplitGNSiLU/_SplitConv): the virtual-concat
formulation must equal the materialized-concat one with the SAME params."""
import jax
import jax.numpy as jnp
import numpy as np

from ratio_guided_multimodal_fm_tpu.models.layers import ResBlock
from ratio_guided_multimodal_fm_tpu.models.unet import FlexibleUNet


def test_resblock_split_equals_concat():
    h = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 12))
    s = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 20))
    t_emb = jax.random.normal(jax.random.PRNGKey(2), (2, 16))
    rb = ResBlock(out_channels=16)
    cat = jnp.concatenate([h, s], axis=-1)
    p = rb.init(jax.random.PRNGKey(3), cat, t_emb)
    ref = rb.apply(p, cat, t_emb)
    got = rb.apply(p, h, t_emb, skip_in=s)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_resblock_split_param_structure_matches():
    h = jnp.zeros((1, 4, 4, 8))
    s = jnp.zeros((1, 4, 4, 8))
    t_emb = jnp.zeros((1, 16))
    rb = ResBlock(out_channels=8)
    p_cat = rb.init(jax.random.PRNGKey(0),
                    jnp.concatenate([h, s], -1), t_emb)["params"]
    p_split = rb.init(jax.random.PRNGKey(0), h, t_emb,
                      skip_in=s)["params"]
    assert jax.tree_util.tree_structure(p_cat) == \
        jax.tree_util.tree_structure(p_split)
    for a, b in zip(jax.tree_util.tree_leaves(p_cat),
                    jax.tree_util.tree_leaves(p_split)):
        assert a.shape == b.shape


def test_unet_split_skip_equals_default():
    """Full U-Net forward with split_skip=True equals the default graph
    for identical params — including the group-boundary-crossing case
    (mnist decoder: 96 channels, groups of 12 span the h/skip seam)."""
    kw = dict(in_channels=1, img_size=16, model_channels=32,
              channel_mult=(1, 2), num_res_blocks=2, dropout=0.1)
    fm = FlexibleUNet(**kw)
    fm_split = FlexibleUNet(**kw, split_skip=True)
    x = jax.random.normal(jax.random.PRNGKey(4), (2, 16, 16, 1))
    t = jnp.array([0.3, 0.9])
    p = fm.init(jax.random.PRNGKey(5), x, t)
    ref = fm.apply(p, x, t)
    got = fm_split.apply(p, x, t)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)
