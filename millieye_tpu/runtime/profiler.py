"""Stage timing + profiler integration for the streaming runtime.

The reference instruments with ad-hoc ``time.time()`` deltas printed as
FPS (run_sp.py:210-234, run_mp.py:307-317). This provides the same
per-stage numbers as a reusable utility, plus hooks into ``jax.profiler``
for real TPU traces (tensorboard-viewable) instead of print statements.
"""
from __future__ import annotations

import contextlib
import time


class StageTimer:
    """Exponentially-smoothed per-stage wall time -> FPS.

    >>> t = StageTimer(("track", "preproc", "device", "post"))
    >>> with t("device"): run_step()
    >>> t.fps("device")
    """

    def __init__(self, stages=(), alpha=0.1):
        self.alpha = alpha
        self._ema = {s: None for s in stages}
        self._last = {}

    @contextlib.contextmanager
    def __call__(self, stage):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.add(stage, time.perf_counter() - t0)

    def add(self, stage, dt):
        prev = self._ema.get(stage)
        self._ema[stage] = dt if prev is None else (
            (1 - self.alpha) * prev + self.alpha * dt)
        self._last[stage] = dt

    def fps(self, stage):
        e = self._ema.get(stage)
        return 0.0 if not e else 1.0 / e

    def report(self):
        return {s: round(self.fps(s), 1) for s, e in self._ema.items()
                if e is not None}


@contextlib.contextmanager
def trace_annotation(name):
    """jax.profiler.TraceAnnotation when available, no-op otherwise."""
    try:
        import jax.profiler as jp
        with jp.TraceAnnotation(name):
            yield
    except Exception:
        yield


@contextlib.contextmanager
def device_trace(logdir):
    """Capture a device trace for the enclosed block (view in tensorboard)."""
    import jax.profiler as jp
    jp.start_trace(logdir)
    try:
        yield
    finally:
        jp.stop_trace()
