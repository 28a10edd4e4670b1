"""Test config: force CPU with 8 fake devices (the JAX-native way to test
multi-chip sharding without hardware, SURVEY §4).

NOTE: this environment's axon site hook pre-imports jax at interpreter
startup, so env vars set here are too late — use jax.config.update instead
(works because backends initialize lazily, after conftest runs).
"""
import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
# NaN guards (core/guards.py) on for the whole suite (SURVEY §5.2).
os.environ.setdefault("RGMF_NAN_CHECKS", "1")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "multiprocess: spawns REAL extra Python processes (jax.distributed"
        " + gloo); the slowest tests — deselect with -m 'not multiprocess'"
        " for a quick pass")
    config.addinivalue_line(
        "markers",
        "slow: multi-minute single-process tests (training loops)")
