"""Tracing / profiling / metrics (SURVEY §5.1/§5.5 — absent in the reference).

* `profile_trace` — context manager around `jax.profiler` for step/sampler
  traces viewable in TensorBoard/XProf.
* `StepTimer` — wall-clock + steps/sec + samples/sec/chip counters (the
  BASELINE.json metrics).
* `MetricsLogger` — structured JSONL metrics with optional TensorBoard
  scalars (closing the gap the reference left: tensorboard pinned in its
  requirements but never imported).
"""
from __future__ import annotations

import contextlib
import json
import os
import time
from typing import Dict, Optional

import jax


@contextlib.contextmanager
def profile_trace(logdir: Optional[str]):
    """Trace the enclosed computation with jax.profiler when logdir is set."""
    if not logdir:
        yield
        return
    os.makedirs(logdir, exist_ok=True)
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Throughput counters; call tick() once per step."""

    def __init__(self, batch_size: int = 0):
        self.batch_size = batch_size
        self.n_steps = 0
        self._t0 = None

    def start(self):
        self._t0 = time.perf_counter()
        self.n_steps = 0

    def tick(self):
        if self._t0 is None:
            self.start()
        self.n_steps += 1

    @property
    def elapsed(self) -> float:
        return time.perf_counter() - self._t0 if self._t0 else 0.0

    @property
    def steps_per_sec(self) -> float:
        return self.n_steps / max(self.elapsed, 1e-9)

    @property
    def samples_per_sec(self) -> float:
        return self.steps_per_sec * self.batch_size

    def summary(self) -> Dict[str, float]:
        n_dev = jax.device_count()
        return {
            "steps_per_sec": self.steps_per_sec,
            "samples_per_sec": self.samples_per_sec,
            "samples_per_sec_per_chip": self.samples_per_sec / max(n_dev, 1),
        }


class MetricsLogger:
    """Structured metrics: JSONL always, TensorBoard scalars when available."""

    def __init__(self, out_dir: str, name: str = "metrics",
                 tensorboard: bool = False):
        os.makedirs(out_dir, exist_ok=True)
        self._path = os.path.join(out_dir, f"{name}.jsonl")
        self._f = open(self._path, "a")
        self._tb = None
        if tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter  # cpu torch

                self._tb = SummaryWriter(os.path.join(out_dir, "tb"))
            except Exception:
                self._tb = None

    def log(self, step: int, metrics: Dict[str, float]):
        rec = {"step": step, "time": time.time()}
        rec.update({k: float(v) for k, v in metrics.items()})
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()
        if self._tb is not None:
            for k, v in metrics.items():
                self._tb.add_scalar(k, float(v), step)

    def close(self):
        self._f.close()
        if self._tb is not None:
            self._tb.close()
