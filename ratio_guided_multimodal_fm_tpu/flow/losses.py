"""Density-ratio losses as pure, maskable functions.

Parity with ref losses.py (DiscriminatorLoss :27-68, RuLSIFLoss :71-133).

TPU-first difference: the reference splits the batch with boolean indexing
(`scores[is_real == 1]`, trainer.py:44-45), which is a dynamic shape and
un-jittable. Here the math is expressed with masked means over the full
fixed-shape batch — mathematically identical (each reference term is a mean
over the real or fake subset, or over their concatenation), and it handles
the single-class-batch edge case the reference special-cases
(train_ratio_mnist_svhn.py:50-57) by clamping the denominator.
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp


def _masked_mean(x: jax.Array, mask: jax.Array) -> jax.Array:
    n = jnp.maximum(mask.sum(), 1.0)
    return (x * mask).sum() / n


def disc_loss(scores: jax.Array, is_real: jax.Array) -> Tuple[jax.Array, Dict]:
    """Logistic-regression loss (ref losses.py:27-68).

    BCE-with-logits identities: BCE(s, 1) = softplus(-s), BCE(s, 0) = softplus(s).
    loss = E_real[softplus(-s)] + E_fake[softplus(s)].
    """
    s = scores.astype(jnp.float32)
    real = is_real.astype(jnp.float32)
    fake = 1.0 - real
    loss_real = _masked_mean(jax.nn.softplus(-s), real)
    loss_fake = _masked_mean(jax.nn.softplus(s), fake)
    loss = loss_real + loss_fake
    metrics = {
        "loss": loss,
        "acc_real": _masked_mean((s > 0).astype(jnp.float32), real),
        "acc_fake": _masked_mean((s < 0).astype(jnp.float32), fake),
    }
    return loss, metrics


def rulsif_loss(
    scores: jax.Array,
    is_real: jax.Array,
    alpha: float = 0.2,
    lambda_penalty: float = 0.1,
) -> Tuple[jax.Array, Dict]:
    """Relative uLSIF loss (ref losses.py:71-133).

    w = softplus(T); mixture approximated by the full batch (reference
    concatenates real+fake scores, losses.py:108-109):
      loss = 0.5·E_mix[w²] − E_q[w] + λ(E_mix[w] − 1)²
    """
    s = scores.astype(jnp.float32)
    real = is_real.astype(jnp.float32)
    w = jax.nn.softplus(s)
    sq_term = 0.5 * jnp.mean(w**2)
    linear_term = -_masked_mean(w, real)
    constraint = lambda_penalty * (jnp.mean(w) - 1.0) ** 2
    loss = sq_term + linear_term + constraint
    metrics = {
        "loss": loss,
        "mean_w_real": _masked_mean(w, real),
        "mean_w_fake": _masked_mean(w, 1.0 - real),
        "constraint_term": constraint,
    }
    return loss, metrics


def get_ratio_loss(loss_type: str = "disc", **kwargs):
    """Factory mirroring ref losses.py:136-155; returns f(scores, is_real)."""
    if loss_type == "disc":
        return disc_loss
    elif loss_type == "rulsif":
        alpha = kwargs.get("alpha", 0.2)
        lam = kwargs.get("lambda_penalty", 0.1)
        return lambda s, m: rulsif_loss(s, m, alpha=alpha, lambda_penalty=lam)
    raise ValueError(f"Unknown loss type: {loss_type}")


def masked_ratio_loss(scores, is_real, loss_type="disc", **kwargs):
    return get_ratio_loss(loss_type, **kwargs)(scores, is_real)
