"""Epoch drivers: best/periodic checkpoints + early stopping.

Patience semantics mirror ref train_flow.py:84-117 (best-loss tracking,
save_every periodic saves, stop after `patience` non-improving epochs).
"""
from __future__ import annotations

import time
from typing import Callable, Iterable, Optional

import jax
import numpy as np

from ratio_guided_multimodal_fm_tpu.core.prng import RNG
from ratio_guided_multimodal_fm_tpu.train.checkpoint import (
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
):
    """Generic FM training driver. Returns (state, best_loss, history).

    Preemption-safe (SURVEY §5.3): SIGTERM sets a flag (train/
    preemption.py); the driver finishes the in-flight step, saves
    {params, opt_state, epoch, step, best_loss, patience_counter} to
    `preempt_path` and returns with history[-1]["preempted"]=True. Resume
    by restoring the state and passing (start_epoch, start_step,
    start_best, start_patience_counter) — the early-stop bookkeeping must
    survive the restart or a post-resume worse epoch would overwrite the
    saved best model. Exactness: per-step train keys are
    fold_in(root, epoch, step) — position-addressed, not a sequential
    stream — and epoch batch order is position-addressed too
    (data_iter_fn(epoch) must derive order from the epoch argument, e.g.
    _EpochLoader.epoch(e)), so a mid-epoch restart reproduces the
    uninterrupted run bit-for-bit (tests/test_preemption.py).
    """
    from ratio_guided_multimodal_fm_tpu.train.preemption import (
        PreemptionGuard,
    )

    stopper = EarlyStopper(patience)
    stopper.best = start_best
    stopper.counter = start_patience_counter
    history = []
    root_key = rng.next()   # per-step keys derive from (epoch, step)

    def _save_preempt(epoch, step_i):
        if preempt_path:
            save_checkpoint(preempt_path, {
                "params": state.params,
                "opt_state": state.opt_state,
                "epoch": epoch,
                "step": step_i,
                "best_loss": stopper.best,
                "patience_counter": stopper.counter,
            })
            log_fn(f"  -> Preempted: resumable checkpoint at "
                   f"{preempt_path} (epoch {epoch}, step {step_i})")

    guard_ctx = PreemptionGuard()
    with guard_ctx as guard:
        for epoch in range(start_epoch, epochs):
            t0 = time.time()
            losses = []
            skip = start_step if epoch == start_epoch else 0
            epoch_key = jax.random.fold_in(root_key, epoch)
            for step_i, x1 in enumerate(data_iter_fn(epoch)):
                if step_i < skip:
                    continue
                state, loss = train_step(
                    state, x1, jax.random.fold_in(epoch_key, step_i))
                losses.append(loss)
                if guard.preempted:
                    wait_for_saves()
                    _save_preempt(epoch, step_i + 1)
                    history.append({"epoch": epoch + 1,
                                    "preempted_at_step": step_i + 1,
                                    "preempted": True})
                    wait_for_saves()
                    return state, stopper.best, history
            if not losses:
                # Resumed exactly at the epoch boundary (preempted on its
                # last step): nothing ran — don't feed NaN to the stopper
                # or metrics, just move to the next epoch.
                continue
            avg = float(np.mean([jax.device_get(l) for l in losses]))
            dt = time.time() - t0
            steps_per_sec = len(losses) / max(dt, 1e-9)
            history.append({"epoch": epoch + 1, "loss": avg,
                            "steps_per_sec": steps_per_sec})
            if metrics_logger is not None:
                metrics_logger.log(epoch + 1, {"loss": avg,
                                               "steps_per_sec": steps_per_sec})
            log_fn(f"Epoch {epoch+1}/{epochs} - Loss: {avg:.4f} "
                   f"({steps_per_sec:.1f} steps/s)")

            # Saves overlap the next epoch's compute (Orbax background
            # thread); wait_for_saves() below barriers before returning, and
            # load_checkpoint barriers too, so no half-written tree is read.
            if stopper.update(avg):
                if best_path:
                    save_checkpoint(best_path, state.params, async_save=True)
                    log_fn(f"  -> Saved best model: {best_path}")
            if periodic_path_fn and (epoch + 1) % save_every == 0:
                save_checkpoint(periodic_path_fn(epoch + 1), state.params,
                                async_save=True)
            if stopper.should_stop:
                log_fn(f"\nEarly stopping after {epoch+1} epochs "
                       f"(patience={patience})")
                break
    wait_for_saves()
    return state, stopper.best, history
