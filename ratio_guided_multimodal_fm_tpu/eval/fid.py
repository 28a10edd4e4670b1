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


def compute_inception_fid(real_images, gen_images, weights_path: str,
                          batch_size: int = 64) -> float:
    """True Inception-FID from a USER-PROVIDED Inception network file.

    BASELINE.json's north-star metric is Inception-FID; the Inception
    weights cannot be downloaded in this offline environment, so the
    framework ships the PIPELINE and runs it whenever the user supplies a
    network (`--inception_weights`). Accepted formats, tried in order:
      1. a TorchScript module (torch.jit.load — e.g. the clean-fid /
         pytorch-fid scripted inception, no torchvision needed),
      2. a torchvision inception_v3 state_dict (.pth; needs torchvision).
    Without a file, callers use `compute_fid` above (classifier-feature
    Fréchet distance), clearly labeled in every artifact
    (VERDICT r2 §missing-3). Fails loudly; never substitutes silently.

    Images: NHWC float in [-1, 1]; grayscale tiled to RGB; resized to the
    standard 299×299.
    """
    import os

    if not os.path.exists(weights_path):
        raise FileNotFoundError(
            f"Inception weights not found: {weights_path} (offline "
            "environment — provide a TorchScript inception or "
            "torchvision inception_v3 .pth)")
    import torch
    import torch.nn.functional as F

    try:
        net = torch.jit.load(weights_path, map_location="cpu")
    except Exception:
        from torchvision.models import inception_v3  # may ImportError

        net = inception_v3(weights=None, aux_logits=True,
                           init_weights=False)
        net.load_state_dict(torch.load(weights_path, map_location="cpu"))
        net.fc = torch.nn.Identity()     # pool3 features (2048-d)
    net.eval()

    def feats(imgs):
        out = []
        with torch.no_grad():
            for i in range(0, len(imgs), batch_size):
                b = np.asarray(imgs[i:i + batch_size], np.float32)
                if b.shape[-1] == 1:
                    b = np.repeat(b, 3, axis=-1)
                t = torch.from_numpy(b).permute(0, 3, 1, 2)  # NCHW
                t = F.interpolate(t, size=(299, 299), mode="bilinear",
                                  align_corners=False)
                f = net(t)
                if not torch.is_tensor(f):   # torchvision InceptionOutputs
                    f = f[0] if isinstance(f, (tuple, list)) else f.logits
                out.append(f.reshape(len(b), -1).numpy())
        return np.concatenate(out)

    return fid_from_features(feats(real_images), feats(gen_images))
