"""Fréchet distance metric on classifier features ("classifier-FID").

The reference has no FID; BASELINE.json names it as a build-target metric.
With no Inception network available offline, features come from the eval
classifier's penultimate ('fc1') activations — captured via Flax
intermediates, no model changes needed. Standard Fréchet formula:
    FID = ||mu1-mu2||² + Tr(C1 + C2 - 2(C1 C2)^{1/2}).
"""
from __future__ import annotations

import numpy as np


def extract_features(model, variables, images, layer: str = "fc1") -> np.ndarray:
    """Penultimate activations [B, F] from a classifier module."""
    _, state = model.apply(
        variables, images, deterministic=True,
        capture_intermediates=lambda mdl, method: mdl.name == layer,
        mutable=["intermediates"],
    )
    inter = state["intermediates"]
    # walk to the captured leaf
    while isinstance(inter, dict):
        key = next(iter(inter))
        inter = inter[key]
    return np.asarray(inter[0] if isinstance(inter, tuple) else inter)


def fid_from_features(f1: np.ndarray, f2: np.ndarray, eps: float = 1e-6) -> float:
    from scipy import linalg

    f1 = np.asarray(f1, np.float64)
    f2 = np.asarray(f2, np.float64)
    mu1, mu2 = f1.mean(0), f2.mean(0)
    c1 = np.cov(f1, rowvar=False)
    c2 = np.cov(f2, rowvar=False)
    diff = mu1 - mu2
    covmean, _ = linalg.sqrtm(c1 @ c2, disp=False)
    if not np.isfinite(covmean).all():
        offset = np.eye(c1.shape[0]) * eps
        covmean, _ = linalg.sqrtm((c1 + offset) @ (c2 + offset), disp=False)
    covmean = covmean.real
    return float(diff @ diff + np.trace(c1) + np.trace(c2) - 2 * np.trace(covmean))


def compute_fid(model, variables, real_images, gen_images,
                batch_size: int = 256) -> float:
    """Classifier-FID between real and generated image sets (NHWC, [-1,1])."""
    def feats(imgs):
        # include the final partial batch — dropping the tail silently
        # changed the statistics whenever len % batch_size != 0
        out = [extract_features(model, variables, imgs[i:i + batch_size])
               for i in range(0, len(imgs), batch_size)]
        return np.concatenate(out)

    return fid_from_features(feats(real_images), feats(gen_images))
