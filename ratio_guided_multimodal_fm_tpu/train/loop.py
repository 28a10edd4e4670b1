"""Epoch drivers: best/periodic checkpoints + early stopping.

Patience semantics mirror ref train_flow.py:84-117 (best-loss tracking,
save_every periodic saves, stop after `patience` non-improving epochs).

`train_epochs` is the generic preemption-safe driver (scalar-loss FM steps
and metrics-dict ratio/classifier steps alike); `train_flow_matching_epochs`
is the FM-specialized wrapper the flow CLIs and tests use.
"""
from __future__ import annotations

import os
import time
from typing import Callable, Iterable, Optional

import jax
import numpy as np

from ratio_guided_multimodal_fm_tpu.core.prng import RNG
from ratio_guided_multimodal_fm_tpu.train.checkpoint import (
    load_checkpoint,
    save_checkpoint,
    wait_for_saves,
)


class EarlyStopper:
    """Best-loss early stopping (ref train_flow.py:84-117)."""

    def __init__(self, patience: int = 10):
        self.patience = patience
        self.best = float("inf")
        self.counter = 0

    def update(self, loss: float) -> bool:
        """Returns True if this is a new best."""
        if loss < self.best:
            self.best = loss
            self.counter = 0
            return True
        self.counter += 1
        return False

    @property
    def should_stop(self) -> bool:
        return self.counter >= self.patience


def restore_preempt(preempt_path: Optional[str], state):
    """Restore a preemption checkpoint (if one exists at `preempt_path`)
    into `state`.

    Returns (state, resume) where `resume` is a kwargs dict for
    `train_epochs(..., **resume)`: start_epoch, start_step, start_best,
    start_patience_counter, start_partial_sums, start_partial_count.
    `resume` holds all-zero defaults when there is nothing to restore.
    Handles states with and without a batch_stats collection (BatchNorm
    ratio nets).
    """
    resume = {"start_epoch": 0, "start_step": 0,
              "start_best": float("inf"), "start_patience_counter": 0,
              "start_partial_sums": None, "start_partial_count": 0}
    if not (preempt_path and os.path.isdir(preempt_path)):
        return state, resume
    # Raw restore first: the scalar fields (and the metrics-keyed
    # partial_sums dict, whose keys the caller can't know) come straight
    # from disk; a second targeted restore recovers the params/opt_state
    # pytree STRUCTURE (optax states are NamedTuple chains that a raw
    # restore would flatten to dicts).
    raw = load_checkpoint(preempt_path)
    target = dict(raw)
    target["params"] = state.params
    target["opt_state"] = state.opt_state
    has_bs = getattr(state, "batch_stats", None) is not None
    if has_bs and "batch_stats" in raw:
        target["batch_stats"] = state.batch_stats
    has_ema = getattr(state, "ema_params", None) is not None
    if has_ema and "ema_params" in raw:
        target["ema_params"] = state.ema_params
    restored = load_checkpoint(preempt_path, target=target)
    repl = {"params": restored["params"], "opt_state": restored["opt_state"]}
    if has_bs and "batch_stats" in restored:
        repl["batch_stats"] = restored["batch_stats"]
    if has_ema and "ema_params" in restored:
        repl["ema_params"] = restored["ema_params"]
    state = state.replace(**repl)
    resume.update(
        start_epoch=int(raw["epoch"]), start_step=int(raw["step"]),
        start_best=float(raw["best_loss"]),
        start_patience_counter=int(raw["patience_counter"]))
    if raw.get("partial_count") is not None:
        resume["start_partial_count"] = int(raw["partial_count"])
        ps = raw.get("partial_sums")
        if ps:
            resume["start_partial_sums"] = {k: float(v)
                                            for k, v in ps.items()}
    return state, resume


def finish_preemptible(history, preempt_path: Optional[str],
                       log_fn: Callable[[str], None] = print) -> bool:
    """Shared CLI epilogue: report the preemption outcome honestly and
    clear consumed resume state. Returns True when the run was preempted
    (the caller should return instead of printing 'Training complete')."""
    if history and history[-1].get("preempted"):
        if preempt_path:
            log_fn("\nPreempted — resumable checkpoint saved; rerun the "
                   "same command to continue.")
        else:
            log_fn("\nPreempted — stopped cleanly after the in-flight "
                   "step. No resumable checkpoint (run with "
                   "--preempt_path to enable step-granular resume).")
        return True
    if (preempt_path and os.path.isdir(preempt_path)
            and jax.process_index() == 0):    # single writer, like saves
        import shutil
        shutil.rmtree(preempt_path)   # completed: clear resume state
    return False


def epoch_data_iter(loader, extract: Callable = lambda b: b):
    """Position-addressed epoch iterator factory for train_epochs: uses
    loader.epoch(e) when available (preemption-resume contract — a
    restarted process must reproduce epoch e's batch order) and maps
    `extract` over batches (e.g. `lambda b: jnp.asarray(b["x"])`).

    Accepts the driver's resume skip count so skipped batches are never
    extracted — `extract` is where the host→device transfer (and, multi-
    process, the global-array assembly) happens, and paying it for
    hundreds of discarded batches on a tunneled backend is pure waste.
    (The loader itself still advances through the skipped positions to
    keep the batch order position-addressed.)
    """
    import itertools

    def data_iter(epoch, skip: int = 0):
        it = (loader.epoch(epoch) if hasattr(loader, "epoch")
              else iter(loader))
        for batch in itertools.islice(it, skip, None):
            yield extract(batch)
    return data_iter


def train_epochs(
    state,
    train_step: Callable,              # (state, batch, key) -> (state, out)
    data_iter_fn: Callable[[int], Iterable],  # epoch -> iterable of batches
    epochs: int,
    rng: RNG,
    loss_key: Optional[str] = None,    # None: out is a scalar loss;
                                       # else: out is a metrics dict and
                                       # out[loss_key] drives early stopping
    save_best_fn: Optional[Callable] = None,      # (state, epoch, best)
    save_periodic_fn: Optional[Callable] = None,  # (state, epoch, best)
    save_every: int = 10,
    patience: int = 10,
    log_fn: Callable[[str], None] = print,
    metrics_logger=None,
    preempt_path: Optional[str] = None,
    start_epoch: int = 0,
    start_step: int = 0,
    start_best: float = float("inf"),
    start_patience_counter: int = 0,
    start_partial_sums: Optional[dict] = None,
    start_partial_count: int = 0,
):
    """Generic training driver. Returns (state, best_loss, history).

    Preemption-safe (SURVEY §5.3): SIGTERM sets a flag (train/
    preemption.py); the driver finishes the in-flight step, saves
    {params, opt_state, batch_stats?, epoch, step, best_loss,
    patience_counter, partial_sums, partial_count} to `preempt_path` and
    returns with history[-1]["preempted"]=True. Resume by restoring the
    state and passing the start_* kwargs — `restore_preempt` does both.
    The early-stop bookkeeping must survive the restart or a post-resume
    worse epoch would overwrite the saved best model; the PARTIAL-EPOCH
    metric sums must survive too, or the restart epoch's average would
    cover only post-resume steps and the best-checkpoint / early-stop
    decisions would diverge from the uninterrupted run. Exactness:
    per-step train keys are fold_in(root, epoch, step) —
    position-addressed, not a sequential stream — and epoch batch order
    is position-addressed too (data_iter_fn(epoch) must derive order from
    the epoch argument, e.g. _EpochLoader.epoch(e)), so a mid-epoch
    restart reproduces the uninterrupted run bit-for-bit
    (tests/test_preemption.py).
    """
    from ratio_guided_multimodal_fm_tpu.train.preemption import (
        PreemptionGuard,
    )

    stopper = EarlyStopper(patience)
    stopper.best = start_best
    stopper.counter = start_patience_counter
    history = []
    root_key = rng.next()   # per-step keys derive from (epoch, step)

    def _sums(outs):
        """Host-side per-key sums of the step outputs so far."""
        if loss_key is None:
            return {"loss": float(np.sum([jax.device_get(o)
                                          for o in outs]))} if outs else {}
        if not outs:
            return {}
        return {k: float(np.sum([jax.device_get(o[k]) for o in outs]))
                for k in outs[0]}

    def _save_preempt(epoch, step_i, sums, count):
        if preempt_path:
            tree = {
                "params": state.params,
                "opt_state": state.opt_state,
                "epoch": epoch,
                "step": step_i,
                "best_loss": stopper.best,
                "patience_counter": stopper.counter,
                "partial_sums": sums,
                "partial_count": count,
            }
            if getattr(state, "batch_stats", None) is not None:
                tree["batch_stats"] = state.batch_stats
            if getattr(state, "ema_params", None) is not None:
                tree["ema_params"] = state.ema_params
            save_checkpoint(preempt_path, tree)
            log_fn(f"  -> Preempted: resumable checkpoint at "
                   f"{preempt_path} (epoch {epoch}, step {step_i})")

    # Multi-process runs must AGREE on preemption before acting on it:
    # with per-process SIGTERM delivery, one process can see the flag a
    # step earlier than another — the early one would enter the collective
    # Orbax save (blocking on its peers) while the late one launches the
    # next step's SPMD program (blocking on the early one's devices):
    # permanent distributed deadlock. A per-step 1-byte all-gather ORs the
    # local flags so every process preempts at the SAME step (cost: one
    # host collective per step, multi-process only).
    pc = jax.process_count()

    def _agreed_preempt(local: bool) -> bool:
        if pc == 1:
            return local
        from jax.experimental import multihost_utils
        return bool(np.any(multihost_utils.process_allgather(
            np.asarray([local]))))

    guard_ctx = PreemptionGuard()
    with guard_ctx as guard:
        for epoch in range(start_epoch, epochs):
            t0 = time.time()
            outs = []
            restarting = epoch == start_epoch
            skip = start_step if restarting else 0
            carry = dict(start_partial_sums or {}) if restarting else {}
            carry_n = start_partial_count if restarting else 0
            epoch_key = jax.random.fold_in(root_key, epoch)
            # Prefer iterators that accept the skip count (epoch_data_iter)
            # so resume doesn't extract/transfer the skipped batches;
            # plain (epoch)-only iterators fall back to inline skipping.
            try:
                iterator = enumerate(data_iter_fn(epoch, skip), start=skip)
                inline_skip = 0
            except TypeError:
                iterator = enumerate(data_iter_fn(epoch))
                inline_skip = skip
            for step_i, batch in iterator:
                if step_i < inline_skip:
                    continue
                state, out = train_step(
                    state, batch, jax.random.fold_in(epoch_key, step_i))
                outs.append(out)
                if _agreed_preempt(guard.preempted):
                    wait_for_saves()
                    sums = _sums(outs)
                    for k, v in carry.items():
                        sums[k] = sums.get(k, 0.0) + v
                    _save_preempt(epoch, step_i + 1, sums,
                                  len(outs) + carry_n)
                    history.append({"epoch": epoch + 1,
                                    "preempted_at_step": step_i + 1,
                                    "preempted": True})
                    wait_for_saves()
                    return state, stopper.best, history
            n_steps = len(outs) + carry_n
            if not n_steps:
                # Nothing ran and nothing was carried (epoch produced no
                # batches) — don't feed NaN to the stopper or metrics.
                continue
            dt = time.time() - t0
            steps_per_sec = len(outs) / max(dt, 1e-9)
            totals = _sums(outs)
            for k, v in carry.items():
                totals[k] = totals.get(k, 0.0) + v
            avg = {k: v / n_steps for k, v in totals.items()}
            avg_loss = avg[loss_key or "loss"]
            if loss_key is None:
                log_fn(f"Epoch {epoch+1}/{epochs} - Loss: {avg_loss:.4f} "
                       f"({steps_per_sec:.1f} steps/s)")
            else:
                log_fn(f"Epoch {epoch+1}/{epochs} - " +
                       " - ".join(f"{k}: {v:.4f}" for k, v in avg.items()))
            history.append({"epoch": epoch + 1, **avg,
                            "steps_per_sec": steps_per_sec})
            if metrics_logger is not None:
                metrics_logger.log(epoch + 1, {**avg,
                                               "steps_per_sec": steps_per_sec})

            # Saves overlap the next epoch's compute (Orbax background
            # thread); wait_for_saves() below barriers before returning, and
            # load_checkpoint barriers too, so no half-written tree is read.
            if stopper.update(avg_loss) and save_best_fn:
                save_best_fn(state, epoch + 1, stopper.best)
            if save_periodic_fn and (epoch + 1) % save_every == 0:
                save_periodic_fn(state, epoch + 1, stopper.best)
            if stopper.should_stop:
                log_fn(f"\nEarly stopping after {epoch+1} epochs "
                       f"(patience={patience})")
                break
    wait_for_saves()
    return state, stopper.best, history


def train_flow_matching_epochs(
    state,
    train_step: Callable,
    data_iter_fn: Callable[[int], Iterable],  # epoch -> iterable of x1 batches
    epochs: int,
    rng: RNG,
    best_path: Optional[str] = None,
    periodic_path_fn: Optional[Callable[[int], str]] = None,
    save_every: int = 10,
    patience: int = 10,
    log_fn: Callable[[str], None] = print,
    metrics_logger=None,
    preempt_path: Optional[str] = None,
    start_epoch: int = 0,
    start_step: int = 0,
    start_best: float = float("inf"),
    start_patience_counter: int = 0,
    start_partial_sums: Optional[dict] = None,
    start_partial_count: int = 0,
):
    """FM-specialized wrapper over `train_epochs` (scalar-loss steps,
    params-only best/periodic checkpoints). Returns (state, best, history).

    When the state carries EMA params (create_fm_state(ema_decay=...)),
    every best save also writes the Polyak average next to it with an
    `_ema` suffix on the final name part (flow_x_best → flow_x_ema_best) —
    the sample/evaluate CLIs load it with --ema.
    """
    from ratio_guided_multimodal_fm_tpu.train.checkpoint import (
        ema_checkpoint_path as _ema_path,
    )

    def save_best(s, epoch, best):
        if best_path:
            save_checkpoint(best_path, s.params, async_save=True)
            log_fn(f"  -> Saved best model: {best_path}")
            if getattr(s, "ema_params", None) is not None:
                save_checkpoint(_ema_path(best_path), s.ema_params,
                                async_save=True)
                log_fn(f"  -> Saved EMA model: {_ema_path(best_path)}")

    def save_periodic(s, epoch, best):
        if periodic_path_fn:
            save_checkpoint(periodic_path_fn(epoch), s.params,
                            async_save=True)

    return train_epochs(
        state, train_step, data_iter_fn, epochs, rng,
        loss_key=None,
        save_best_fn=save_best, save_periodic_fn=save_periodic,
        save_every=save_every, patience=patience, log_fn=log_fn,
        metrics_logger=metrics_logger, preempt_path=preempt_path,
        start_epoch=start_epoch, start_step=start_step,
        start_best=start_best, start_patience_counter=start_patience_counter,
        start_partial_sums=start_partial_sums,
        start_partial_count=start_partial_count)
