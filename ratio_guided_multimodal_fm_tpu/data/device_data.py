"""Device-resident dataset caching.

On this hardware the host↔device link is the input bottleneck: a B=128
32×32×3 f32 batch is ~1.5MB, and streaming it per step through the axon
tunnel dwarfs the step's compute (measured on the 64px config: moving the
dataset to HBM once and gathering batches on-device made training ~10×
faster — scripts/config5_demo.py history). These datasets are small
(MNIST-32 ≈ 188MB, SVHN ≈ 900MB as f32) next to 16GB HBM, so the
TPU-native layout is: upload each full normalized array ONCE; epoch
iterators keep drawing host-side index permutations/pairings (numpy over
labels — cheap), and `array[idx]` then lowers to an on-device gather fed
by a ~1KB index transfer.

`maybe_device_cache` is the single switch: 'auto' (default) uploads when
the default backend is a TPU and leaves CPU runs (tests) untouched;
RGMF_DEVICE_DATA=0/1 forces. Loaders stay API-identical — jnp arrays
support the same fancy indexing the pipeline functions already use.
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np


def _enabled() -> bool:
    env = os.environ.get("RGMF_DEVICE_DATA", "auto")
    if env in ("0", "false", "off"):
        return False
    if env in ("1", "true", "on"):
        return True
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def maybe_device_cache(arr: np.ndarray):
    """Upload a full dataset array to the default device when profitable
    (see module docstring); otherwise return it unchanged."""
    if _enabled():
        return jax.device_put(jnp.asarray(arr))
    return arr
