"""Checkpoint save/load with the reference's naming semantics.

Parity:
* `get_checkpoint_path('flow','x',None,'best')` → 'checkpoints/flow_x_best'
  (ref path_utils.py:7-32: None parts dropped; we drop the .pth suffix —
  checkpoints are Orbax directories, not torch pickles).
* Dual-format load (ref utils/__init__.py:25-51): checkpoints are either a
  bare params tree ("model_state_dict" analogue) or a full train dict
  {'params', 'opt_state'?, 'batch_stats'?, 'epoch', 'best_loss'}.

Orbax gives async-capable, sharding-aware saves (SURVEY §5.3/5.4 plan).
"""
from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

CHECKPOINT_DIR = "checkpoints"


def get_checkpoint_path(model_type: str, *args, base_dir: Optional[str] = None) -> str:
    """Mirror of ref path_utils.get_checkpoint_path (drops None parts)."""
    base = base_dir or CHECKPOINT_DIR
    os.makedirs(base, exist_ok=True)
    parts = [str(a) for a in args if a is not None]
    return os.path.join(base, f"{model_type}_{'_'.join(parts)}")


def checkpoint_exists(path: str) -> bool:
    return os.path.isdir(path) and bool(os.listdir(path))


def ema_checkpoint_path(path: str) -> str:
    """Sibling name for the Polyak-averaged weights of a best checkpoint:
    insert `_ema` before the final name part of the BASENAME only
    ('my_runs/flow_x_best' -> 'my_runs/flow_x_ema_best', never touching
    the directory). Shared by the FM epoch driver and the ratio CLIs so
    train-side writes and --ema/--ratio_ema loads agree on the name."""
    d, base = os.path.split(path)
    head, _, tail = base.rpartition("_")
    new = f"{head}_ema_{tail}" if head else f"{base}_ema"
    return os.path.join(d, new) if d else new


def _to_host(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


_ASYNC_CKPTR: Optional[ocp.AsyncCheckpointer] = None


def _async_ckptr() -> ocp.AsyncCheckpointer:
    global _ASYNC_CKPTR
    if _ASYNC_CKPTR is None:
        _ASYNC_CKPTR = ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())
    return _ASYNC_CKPTR


def save_checkpoint(path: str, tree: Any, async_save: bool = False) -> None:
    """Save a pytree (params-only or full train dict) to `path`.

    With async_save=True the save proceeds in a background thread (Orbax
    AsyncCheckpointer) so the train loop keeps stepping — call
    `wait_for_saves()` before process exit (SURVEY §5.3 plan).

    Multi-process runs: EVERY process must call this (the replicated
    metrics make all processes take the same save decisions, so they do)
    — Orbax coordinates the write internally (primary-host writes,
    cross-process barriers). Gating to process 0 deadlocks the primary
    inside Orbax's sync (observed in tests/test_multihost_train.py's
    development); do not "optimize" this into an early return.
    """
    path = os.path.abspath(path)
    if async_save:
        ckptr = _async_ckptr()
        ckptr.save(path, args=ocp.args.StandardSave(_to_host(tree)),
                   force=True)
        return
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, _to_host(tree), force=True)
    ckptr.wait_until_finished()


def wait_for_saves() -> None:
    """Block until all async checkpoint saves are durable."""
    if _ASYNC_CKPTR is not None:
        _ASYNC_CKPTR.wait_until_finished()


def load_checkpoint(path: str, target: Any = None) -> Any:
    """Load a checkpoint; with `target` given, restores into its structure.

    Dual-format semantics: if the stored tree has a 'params' key but the
    target doesn't (or vice versa), unwrap/wrap accordingly — mirroring the
    reference's tolerance of raw state_dicts vs full dicts
    (utils/__init__.py:25-51).
    """
    wait_for_saves()  # never read a checkpoint that is still being written
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    if target is None:
        restored = ckptr.restore(path)
    else:
        restored = ckptr.restore(path, target=jax.tree_util.tree_map(np.asarray, target))
    return restored


def save_train_checkpoint(path: str, state, epoch: int, best_loss: float) -> None:
    """Full-dict format (ref train_flow_svhn.py:165-170)."""
    tree = {
        "params": state.params,
        "opt_state": state.opt_state,
        "epoch": np.int64(epoch),
        "best_loss": np.float64(best_loss),
    }
    if getattr(state, "batch_stats", None) is not None:
        tree["batch_stats"] = state.batch_stats
    save_checkpoint(path, tree)


def _key_str(path) -> str:
    return "/".join(str(getattr(k, "key", getattr(k, "idx", k)))
                    for k in path)


def load_params(path: str, params_template: Any) -> Any:
    """Restore a params tree from either format, VALIDATED against the
    template: key paths must match exactly and shapes must agree. (A
    positional leaf-zip silently restored garbage from any checkpoint with
    the same leaf count — round-1 review finding.)"""
    restored = load_checkpoint(path)
    if isinstance(restored, dict) and "params" in restored:
        restored = restored["params"]

    flat_t, treedef = jax.tree_util.tree_flatten_with_path(params_template)
    flat_r = dict(
        (_key_str(p), v)
        for p, v in jax.tree_util.tree_flatten_with_path(restored)[0])

    t_keys = [_key_str(p) for p, _ in flat_t]
    missing = [k for k in t_keys if k not in flat_r]
    extra = [k for k in flat_r if k not in set(t_keys)]
    if missing or extra:
        raise ValueError(
            f"Checkpoint at {path} does not match the model structure.\n"
            f"  missing keys: {missing[:5]}{'...' if len(missing) > 5 else ''}\n"
            f"  unexpected keys: {extra[:5]}{'...' if len(extra) > 5 else ''}")

    leaves = []
    for key, (_, t) in zip(t_keys, flat_t):
        r = np.asarray(flat_r[key])
        if tuple(r.shape) != tuple(t.shape):
            raise ValueError(
                f"Checkpoint at {path}: shape mismatch at '{key}': "
                f"stored {tuple(r.shape)} vs model {tuple(t.shape)}")
        leaves.append(r.astype(t.dtype))
    treedef_only = jax.tree_util.tree_structure(params_template)
    return jax.tree_util.tree_unflatten(treedef_only, leaves)
