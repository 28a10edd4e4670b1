"""Capstone integration test (SURVEY §4 plan): on tiny class-structured
data, train real FM models + a ratio estimator, then verify mc_feng
guidance measurably improves pair coherence over independent sampling.

CPU-runnable in ~1-2 min with tiny models; this is the miniature of the
TPU quality runs archived in docs/results_r1/.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ratio_guided_multimodal_fm_tpu.models import (
    FlexibleRatioEstimator,
    FlexibleUNet,
)
from ratio_guided_multimodal_fm_tpu.sample.guided import (
    GuidedSamplerConfig,
    make_guided_sampler,
)
from ratio_guided_multimodal_fm_tpu.train.steps import (
    create_fm_state,
    create_ratio_state,
    make_fm_train_step,
    make_ratio_train_step,
)

H = 12


def _make_batch(rng, n):
    """Two-class blobs; y = rot90(x) of a same-class (not same!) sample."""
    cls = rng.randint(0, 2, n)
    base = np.full((n, H, H, 1), -0.6, np.float32)
    for i, c in enumerate(cls):
        if c == 0:
            base[i, 1:5, 1:5, 0] = 1.0
        else:
            base[i, 7:11, 7:11, 0] = 1.0
    base += rng.randn(n, H, H, 1).astype(np.float32) * 0.08
    ys = np.rot90(base, k=-1, axes=(1, 2)).copy()
    return base, ys, cls


def _blob_class(im, rot=False):
    im = np.asarray(im)[..., 0]
    if rot:
        im = np.rot90(im, k=1, axes=(1, 2))
    tl = im[:, 1:5, 1:5].sum(axis=(1, 2))
    br = im[:, 7:11, 7:11].sum(axis=(1, 2))
    return (br > tl).astype(int)


@pytest.mark.slow
def test_guidance_improves_coherence_end_to_end():
    rng = np.random.RandomState(0)
    model = FlexibleUNet(in_channels=1, img_size=H, model_channels=8,
                         channel_mult=(1, 2), num_res_blocks=1, dropout=0.0)
    sx = create_fm_state(model, jax.random.PRNGKey(1), (H, H, 1), lr=2e-3)
    sy = create_fm_state(model, jax.random.PRNGKey(2), (H, H, 1), lr=2e-3)
    fstep = make_fm_train_step(model, donate=False)

    for i in range(80):
        x, y, _ = _make_batch(rng, 64)
        sx, _ = fstep(sx, jnp.array(x), jax.random.PRNGKey(100 + i))
        sy, _ = fstep(sy, jnp.array(y), jax.random.PRNGKey(200 + i))

    ratio = FlexibleRatioEstimator(x_channels=1, y_channels=1,
                                   feature_dim=32, hidden_dim=64)
    rs = create_ratio_state(ratio, jax.random.PRNGKey(3), (H, H, 1),
                            (H, H, 1), lr=3e-3)
    rstep = make_ratio_train_step(ratio, "disc", donate=False)
    for i in range(60):
        x, y, cls = _make_batch(rng, 64)
        flip = rng.rand(64) < 0.5
        y_mis = np.rot90(np.where(
            flip[:, None, None, None],
            _make_batch(rng, 64)[0][np.argsort(rng.rand(64))],
            np.rot90(y, k=1, axes=(1, 2))), k=-1, axes=(1, 2))
        # simpler: real = matched rotation pair, fake = shuffled partner
        perm = rng.permutation(64)
        y_fake = y[perm]
        is_real = np.where(flip, (cls == cls[perm]).astype(np.float32), 1.0)
        yy = np.where(flip[:, None, None, None], y_fake, y)
        rs, metrics = rstep(rs, jnp.array(x), jnp.array(yy),
                            jnp.array(is_real), jax.random.PRNGKey(300 + i))

    fm_x = lambda xt, t: model.apply({"params": sx.params}, xt, t)
    fm_y = lambda yt, t: model.apply({"params": sy.params}, yt, t)
    log_ratio = lambda a, b: ratio.apply({"params": rs.params}, a, b,
                                         method=ratio.log_ratio)

    def coherence(method, strength):
        cfg = GuidedSamplerConfig(method, strength, num_steps=24,
                                  mc_batch_size=48, x_shape=(H, H, 1),
                                  y_shape=(H, H, 1))
        sampler = jax.jit(make_guided_sampler(fm_x, fm_y, cfg, log_ratio),
                          static_argnums=(1,))
        x1, y1, _ = sampler(jax.random.PRNGKey(9), 48)
        return float((_blob_class(x1) == _blob_class(y1, rot=True)).mean())

    c0 = coherence("none", 0.0)
    c1 = coherence("mc_feng", 0.8)
    assert c1 > c0 + 0.1, f"guidance did not help: {c0} -> {c1}"
