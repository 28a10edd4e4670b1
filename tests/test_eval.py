"""Eval subsystem: coherence inverse-transform logic + FID sanity."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ratio_guided_multimodal_fm_tpu.data.transforms import apply_transform
from ratio_guided_multimodal_fm_tpu.eval.coherence import (
    evaluate_coherence,
    evaluate_coherence_dual,
)
from ratio_guided_multimodal_fm_tpu.eval.fid import fid_from_features


def test_coherence_inverse_transform_logic():
    """A 'classifier' that reads the blob quadrant: if y = T(x) for matching
    pairs, coherence must be 1.0 after the inverse transform, and ~wrong
    without it."""
    rng = np.random.RandomState(0)
    n = 16
    x = np.full((n, 8, 8, 1), -1.0, np.float32)
    labels = rng.randint(0, 2, n)
    for i, c in enumerate(labels):
        if c == 0:
            x[i, :3, :3, 0] = 1.0    # class 0: top-left
        else:
            x[i, 5:, :3, 0] = 1.0    # class 1: bottom-left
    y = np.asarray(apply_transform("rotate90", x))

    def classify(imgs):
        imgs = np.asarray(imgs)
        tl = imgs[:, :4, :4, 0].sum(axis=(1, 2))
        bl = imgs[:, 4:, :4, 0].sum(axis=(1, 2))
        return jnp.array(np.stack([tl, bl], axis=1))  # logits [N,2]

    res = evaluate_coherence(x, y, classify, transform_type="rotate90")
    assert res["coherence_acc"] == 1.0
    assert (res["pred_x"] == labels).all()


def test_coherence_dual():
    logits_a = jnp.eye(10)[np.array([1, 2, 3, 4])]
    logits_b = jnp.eye(10)[np.array([1, 2, 9, 4])]
    res = evaluate_coherence_dual(
        np.zeros((4, 2, 2, 1)), np.zeros((4, 2, 2, 3)),
        lambda x: logits_a, lambda y: logits_b)
    assert abs(res["coherence_acc"] - 0.75) < 1e-9


def test_fid_identical_is_zero():
    rng = np.random.RandomState(0)
    f = rng.randn(500, 16).astype(np.float32)
    assert abs(fid_from_features(f, f)) < 1e-6


def test_fid_orders_distributions():
    rng = np.random.RandomState(0)
    base = rng.randn(500, 16)
    near = rng.randn(500, 16) * 1.05 + 0.05
    far = rng.randn(500, 16) * 2.0 + 1.5
    assert fid_from_features(base, near) < fid_from_features(base, far)


def test_inception_fid_with_torchscript_net(tmp_path):
    """compute_inception_fid runs a user-provided TorchScript network
    end-to-end (a tiny stand-in here — the real Inception weights cannot
    ship offline; the pipeline is what the framework owns)."""
    import torch

    from ratio_guided_multimodal_fm_tpu.eval.fid import compute_inception_fid

    class Tiny(torch.nn.Module):
        def forward(self, x):          # [B,3,299,299] -> [B,8]
            p = torch.nn.functional.adaptive_avg_pool2d(x, (2, 2))
            return p.reshape(x.shape[0], -1)[:, :8]

    path = str(tmp_path / "net.pt")
    torch.jit.script(Tiny()).save(path)

    rng = np.random.RandomState(0)
    real = rng.randn(24, 16, 16, 1).astype(np.float32)
    same = real.copy()
    diff = real + 1.5
    fid_same = compute_inception_fid(real, same, path)
    fid_diff = compute_inception_fid(real, diff, path)
    assert fid_same < 1e-6
    assert fid_diff > fid_same


def test_inception_fid_missing_weights_fails_loudly():
    from ratio_guided_multimodal_fm_tpu.eval.fid import compute_inception_fid

    with pytest.raises(FileNotFoundError, match="Inception weights"):
        compute_inception_fid(np.zeros((2, 8, 8, 1)), np.zeros((2, 8, 8, 1)),
                              "/nonexistent/weights.pth")
