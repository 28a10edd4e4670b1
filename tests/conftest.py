"""Test config: force CPU with 8 fake devices (the JAX-native way to test
multi-chip sharding without hardware, SURVEY §4)."""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_threefry_partitionable", True)
