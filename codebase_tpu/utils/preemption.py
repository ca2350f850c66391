"""Preemption-safe shutdown: catch SIGTERM, checkpoint, exit cleanly.

SURVEY.md §5 names checkpoint-restart as the failure-recovery story for
TPU jobs (the reference has none: save-only, never restored for training,
`marlbase/dqn/train.py:340-343`). Preemptible TPU VMs deliver SIGTERM with a
grace window; the guard here turns that into "save full train state at the
next chunk boundary and stop", which pairs with ``resume=auto`` (see
`utils/checkpoint.resolve_resume`) to make kill -TERM + relaunch an exact
continuation.

The handler only sets a flag: the train drivers poll it between jitted
chunks, where the train state is complete and on-host transferable. Python
signal handlers run in the main thread between bytecodes, so the flag is
observed right after the in-flight `train_chunk` returns.
"""

from __future__ import annotations

import signal


class PreemptionGuard:
    """Install a SIGTERM handler that records the request instead of dying.

    Use as a context manager so the previous handler is restored:

        with PreemptionGuard() as guard:
            while ...:
                state = train_chunk(state, n)
                if guard.triggered:
                    save_checkpoint(...); break
    """

    def __init__(self, signals=(signal.SIGTERM,)):
        self._signals = tuple(signals)
        self._previous = {}
        self.triggered = False

    def _handler(self, signum, frame):
        self.triggered = True

    def __enter__(self):
        for sig in self._signals:
            self._previous[sig] = signal.signal(sig, self._handler)
        return self

    def __exit__(self, *exc):
        for sig, prev in self._previous.items():
            signal.signal(sig, prev)
        self._previous.clear()
        return False
