"""Optional NaN/Inf guards for jitted train/sample steps (SURVEY §5.2).

The reference has no sanitizers; the JAX-native equivalent of a NaN watch
is a traced finiteness predicate + host callback that raises. Enabled via
RGMF_NAN_CHECKS=1 (tests/conftest.py turns it on for the whole suite;
production paths default off — the callback costs a device→host sync per
guarded value).

The guard is evaluated at TRACE time: flipping the env var after a function
has been compiled has no effect on that compilation, by design (zero
overhead when off).
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp


def nan_checks_enabled() -> bool:
    return os.environ.get("RGMF_NAN_CHECKS", "0").lower() not in (
        "0", "", "false")


def check_finite(x: jax.Array, name: str) -> None:
    """Raise FloatingPointError (from the debug callback) if `x` contains
    NaN/Inf. No-op unless RGMF_NAN_CHECKS is set at trace time. Works under
    jit / scan / shard_map."""
    if not nan_checks_enabled():
        return

    def _cb(ok):
        if not bool(ok):
            raise FloatingPointError(
                f"non-finite values detected in '{name}' "
                f"(RGMF_NAN_CHECKS=1)")

    jax.debug.callback(_cb, jnp.all(jnp.isfinite(x)))
