"""Device mesh & sharding runtime.

The reference is single-process single-device (SURVEY §5.8: no distributed
code of any kind). This module is the new TPU backbone:

* models here are <=9.1M params → params are REPLICATED, batch is sharded
  over the 'data' axis (pure DP over ICI; gradients all-reduce via the psum
  XLA inserts for the replicated-param/ sharded-batch layout).
* the guidance MC axis (N_mc) can additionally be sharded over an 'mc' axis
  — the importance-weight reductions are plain means/sums over N_mc so the
  distributed version is mathematically exact (see sample/guided.py).

All helpers work on any device set, including the CPU fake-mesh used by
tests (XLA_FLAGS=--xla_force_host_platform_device_count=8).
"""
from __future__ import annotations

from typing import Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: int | None = None,
    axis_names: Sequence[str] = ("data",),
    axis_sizes: Sequence[int] | None = None,
) -> Mesh:
    """Create a Mesh over the first `n_devices` devices.

    Default: 1-D 'data' mesh over all devices. Pass axis_names/axis_sizes for
    2-D layouts, e.g. ('data','mc') to co-shard batch and MC-sample axes.
    """
    devs = jax.devices()
    if n_devices is None:
        n_devices = len(devs)
    devs = devs[:n_devices]
    if axis_sizes is None:
        axis_sizes = (n_devices,) + (1,) * (len(axis_names) - 1)
    arr = np.array(devs).reshape(tuple(axis_sizes))
    return Mesh(arr, tuple(axis_names))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Sharding for [B, ...] arrays: leading dim split over `axis`."""
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree, axis: str = "data"):
    """Device-put a pytree of [B, ...] arrays sharded over the mesh axis."""
    s = batch_sharding(mesh, axis)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), tree)


def replicate(mesh: Mesh, tree):
    s = replicated_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), tree)


def pad_to_multiple(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m
