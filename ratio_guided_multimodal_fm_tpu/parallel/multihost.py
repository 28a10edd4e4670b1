"""Multi-host (multi-process) runtime scaffolding — SURVEY §5.8.

The reference is strictly single-process (SURVEY: no torch.distributed /
NCCL anywhere); multi-host execution is a new TPU-native capability. The
JAX model: one Python process per host, `jax.distributed.initialize` wires
them into one global device mesh (ICI within a slice, DCN across hosts),
and every process runs the SAME program over globally-sharded arrays.

Pieces here:
* `maybe_init_distributed` — idempotent entry point; reads flags/env
  (RGMF_COORDINATOR / RGMF_NUM_PROCESSES / RGMF_PROCESS_ID, mirrored by
  the --coordinator_address/--num_processes/--process_id CLI flags in
  cli/common.py). A no-op in the default single-process case, so every
  CLI can call it unconditionally.
* `process_batch_slice` — deterministic per-host row slice of a globally
  ordered batch (host p takes the p-th contiguous block). All hosts run
  the SAME host-side RNG (seeded identically), so the global batch is
  well-defined and identical to the single-host run; each host only
  *materializes* its slice (DCN carries no sample data — SURVEY §5.8
  "DCN only for multi-host data loading").
* `make_global_array` — assemble the per-host slices into one globally
  sharded jax.Array via `jax.make_array_from_process_local_data`, ready
  for a pjit-ted DP train step over mesh axis 'data'.

Tested by tests/test_multihost.py: a real 2-process CPU run (gloo
collectives) asserts the assembled global batch mean equals the
single-process value.
"""
from __future__ import annotations

import os
from typing import Dict, Optional

import jax
import numpy as np

_initialized = False


def maybe_init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize jax.distributed when configured; returns True if multi-
    process. Safe to call multiple times and in single-process runs.

    Resolution order: explicit args > RGMF_* env vars > single-process.
    """
    global _initialized
    coordinator_address = coordinator_address or os.environ.get(
        "RGMF_COORDINATOR")
    if num_processes is None and os.environ.get("RGMF_NUM_PROCESSES"):
        num_processes = int(os.environ["RGMF_NUM_PROCESSES"])
    if process_id is None and os.environ.get("RGMF_PROCESS_ID"):
        process_id = int(os.environ["RGMF_PROCESS_ID"])

    if not coordinator_address or not num_processes or num_processes <= 1:
        return False
    if _initialized:
        return True
    # Cross-process collectives on the CPU backend need gloo (the
    # multi-host CI/test path; TPU uses ICI/DCN natively and ignores this).
    try:
        if (os.environ.get("JAX_PLATFORMS") == "cpu"
                or jax.config.jax_platforms == "cpu"):
            jax.config.update("jax_cpu_collectives_implementation", "gloo")
    except Exception:  # noqa: BLE001 — older/newer jax without the option
        pass
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    # Establish the cross-process collective context NOW, while the
    # processes are still in lockstep from the initialize() rendezvous.
    # The context is created lazily at the FIRST collective, with a hard
    # ~30s rendezvous timeout (gloo GetKeyValue) — and the first collective
    # otherwise happens deep inside the program (e.g. jax.device_put onto a
    # replicated sharding runs multihost_utils.assert_equal), AFTER each
    # process's jit compiles. Compile-time skew between processes easily
    # exceeds 30s under load, so the lazy init times out
    # ("Gloo context initialization failed: DEADLINE_EXCEEDED", observed
    # 2026-08-18 under a concurrent bench). A barrier here pins the
    # context creation to a point where skew is milliseconds.
    from jax.experimental import multihost_utils

    # Mark initialized BEFORE the barrier: jax.distributed.initialize has
    # already succeeded, so a retry after a barrier failure must no-op
    # instead of re-entering initialize ("already initialized").
    _initialized = True
    multihost_utils.sync_global_devices("rgmf:multihost_init")
    return True


def process_info():
    return jax.process_index(), jax.process_count()


def process_batch_slice(batch: Dict[str, np.ndarray],
                        process_index: Optional[int] = None,
                        process_count: Optional[int] = None,
                        ) -> Dict[str, np.ndarray]:
    """Host p's rows of a global batch: the contiguous block
    [p·B/P, (p+1)·B/P) (B must divide by P).

    CONTIGUOUS blocks, because `jax.make_array_from_process_local_data`
    lays out each process's local rows at its devices' positions in the
    global array — with contiguous slices the reassembled global batch is
    bit-identical to the single-host batch (asserted by
    tests/test_multihost.py). Batches are shuffled host-side with a shared
    seed, so contiguity introduces no skew.
    """
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    if pc == 1:
        return batch
    out = {}
    for k, v in batch.items():
        if len(v) % pc:
            raise ValueError(
                f"global batch axis {len(v)} not divisible by "
                f"process_count {pc} (key {k!r})")
        n = len(v) // pc
        out[k] = v[pi * n:(pi + 1) * n]
    return out


def make_global_array(local_rows: np.ndarray, mesh: jax.sharding.Mesh,
                      axis: str = "data") -> jax.Array:
    """Assemble per-host rows into one jax.Array sharded over `axis`.

    `local_rows` is this host's slice (from process_batch_slice); the
    result behaves as the full global batch inside pjit.
    """
    sharding = jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec(axis))
    return jax.make_array_from_process_local_data(sharding, local_rows)


def global_data_mesh() -> jax.sharding.Mesh:
    """1-D ('data',) mesh over ALL global devices (every process's)."""
    return jax.sharding.Mesh(np.array(jax.devices()), ("data",))


def replicate_tree(tree, mesh: jax.sharding.Mesh):
    """Replicate every leaf of a (host-local, identical-on-every-process)
    pytree onto the global mesh — the DP layout for ≤9.1M-param models:
    params/opt_state replicated, batch sharded, XLA all-reduces grads."""
    rep = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())
    return jax.tree_util.tree_map(
        lambda v: jax.make_array_from_process_local_data(rep, np.asarray(v)),
        tree)


def globalize_batch(batch, mesh: jax.sharding.Mesh, axis: str = "data"):
    """Turn a full (identically-seeded) host batch — array or pytree of
    arrays — into globally sharded jax.Arrays: this process materializes
    only its contiguous row slice; the assembled array IS the global
    batch (tests/test_multihost.py)."""
    pi, pc = jax.process_index(), jax.process_count()

    def one(v):
        v = np.asarray(v)
        if len(v) % pc:
            raise ValueError(f"global batch axis {len(v)} not divisible "
                             f"by process_count {pc}")
        n = len(v) // pc
        return make_global_array(v[pi * n:(pi + 1) * n], mesh, axis)

    return jax.tree_util.tree_map(one, batch)
