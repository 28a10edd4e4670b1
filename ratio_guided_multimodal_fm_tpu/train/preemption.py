"""Preemption-safe training (SURVEY §5.3 — round 2 left this partial:
"no failure detection, no preemption handling, restart granularity is
epoch not step").

TPU pods get preempted with a SIGTERM grace window; the TPU-native
response is: finish the in-flight step, flush a resumable checkpoint
(params + optimizer + epoch + STEP), and exit 0 so the scheduler restarts
the job, which resumes mid-epoch. Mid-epoch resume is exact here because
every epoch's batch order is derived from a per-epoch seeded RNG
(data/mnist_dataset._EpochLoader) — skipping the first `step` batches of
the restart epoch reproduces the remaining stream bit-for-bit.

Usage (wired into train/loop.py:train_flow_matching_epochs):

    with PreemptionGuard() as guard:
        for step in epoch:
            ...
            if guard.preempted:
                save_resumable(...); return

`request_preemption()` triggers the same path programmatically (tests,
fault injection).
"""
from __future__ import annotations

import signal
import threading
from typing import Iterable

_flag = threading.Event()


def request_preemption() -> None:
    """Programmatic preemption (fault injection / tests)."""
    _flag.set()


class PreemptionGuard:
    """Installs SIGTERM/SIGINT handlers that set a flag instead of killing
    the process; restores previous handlers on exit. Re-entrant safe for
    nested drivers (flag is process-global)."""

    def __init__(self, signals: Iterable[int] = (signal.SIGTERM,)):
        self._signals = tuple(signals)
        self._prev = {}

    def __enter__(self):
        _flag.clear()
        for s in self._signals:
            try:
                self._prev[s] = signal.signal(
                    s, lambda *_: _flag.set())
            except ValueError:       # non-main thread: flag-only mode
                pass
        return self

    def __exit__(self, *exc):
        for s, h in self._prev.items():
            signal.signal(s, h)
        return False

    @property
    def preempted(self) -> bool:
        return _flag.is_set()
