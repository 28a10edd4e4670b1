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
_depth = 0
_depth_lock = threading.Lock()
_prev_handlers: dict = {}


def request_preemption() -> None:
    """Programmatic preemption (fault injection / tests)."""
    _flag.set()


def arm(signals: Iterable[int] = (signal.SIGTERM,)) -> None:
    """Permanently route `signals` to the preemption flag (no restore).

    CLIs call this at startup (cli/common.init_runtime) so a SIGTERM that
    lands BEFORE the epoch driver enters its PreemptionGuard — during data
    loading, state init, or the first compile, which can take minutes on a
    tunneled backend — is remembered and honored at the first completed
    step instead of killing the process with nothing saved.
    """
    for s in signals:
        try:
            signal.signal(s, lambda *_: _flag.set())
        except ValueError:            # non-main thread: flag-only mode
            pass


class PreemptionGuard:
    """Routes SIGTERM to a process-global flag while active; restores the
    previous handlers when the OUTERMOST guard exits. Nesting-safe: an
    inner guard neither reinstalls handlers nor erases a pending flag
    (a pre-entry SIGTERM — e.g. during `arm()`-covered startup — must be
    honored at the first step, and an outer driver must still see a
    preemption its nested driver responded to). The flag is consumed
    (cleared) only when the outermost guard exits."""

    def __init__(self, signals: Iterable[int] = (signal.SIGTERM,)):
        self._signals = tuple(signals)

    def __enter__(self):
        global _depth
        with _depth_lock:
            if _depth == 0:
                # Handler bookkeeping lives at MODULE level (not on the
                # instance): same-instance nesting and non-LIFO exit of
                # two guards must not restore handlers or clear the flag
                # while any guard is still active.
                for s in self._signals:
                    try:
                        _prev_handlers[s] = signal.signal(
                            s, lambda *_: _flag.set())
                    except ValueError:  # non-main thread: flag-only mode
                        pass
            _depth += 1
        return self

    def __exit__(self, *exc):
        global _depth
        with _depth_lock:
            _depth -= 1
            if _depth == 0:
                for s, h in _prev_handlers.items():
                    signal.signal(s, h)
                _prev_handlers.clear()
                _flag.clear()         # consumed by the last active driver
        return False

    @property
    def preempted(self) -> bool:
        return _flag.is_set()
