"""PRNG-key discipline.

The reference seeds four global RNGs and flips cuDNN into deterministic mode
(`src/utils/__init__.py:7-22`). JAX has no global RNG on the compute path —
determinism is structural. `set_seed` remains for the host-side bits (numpy
shuffling in the input pipeline) and returns a root `jax.random` key; `RNG`
is a tiny splitter that threads keys through training loops.
"""
from __future__ import annotations

import random

import jax
import numpy as np


def set_seed(seed: int = 42) -> jax.Array:
    """Seed host RNGs (python, numpy) and return a root JAX PRNG key.

    Mirrors the intent of reference `src/utils/__init__.py:7-22`; the
    torch/cuda lines have no JAX analogue because jitted computations are
    deterministic functions of their input keys.
    """
    random.seed(seed)
    np.random.seed(seed)
    return jax.random.PRNGKey(seed)


class RNG:
    """Stateful convenience splitter for host-side loop code.

    Inside jitted functions always thread keys explicitly; this class is for
    the epoch-level driver only.
    """

    def __init__(self, seed_or_key):
        if isinstance(seed_or_key, int):
            self._key = jax.random.PRNGKey(seed_or_key)
        else:
            self._key = seed_or_key

    def next(self) -> jax.Array:
        self._key, sub = jax.random.split(self._key)
        return sub

    def split(self, n: int):
        self._key, *subs = jax.random.split(self._key, n + 1)
        return subs
