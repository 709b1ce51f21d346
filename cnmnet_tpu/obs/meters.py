"""Timing/averaging utilities + jax profiler hooks.

``AverageMeter`` mirrors `utils/misc.py:4-24`; ``StepTimer`` wraps the eval
scripts' `time.monotonic` bracketing (`eval.py:259-267`) with proper device
synchronization (block_until_ready) so TPU async dispatch doesn't fake the
numbers; ``profile_trace`` wraps ``jax.profiler`` for on-demand traces.
"""

from __future__ import annotations

import contextlib
import time

import jax


class AverageMeter:
    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.avg = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val, n=1):
        self.val = val
        self.sum += val * n
        self.count += n
        self.avg = self.sum / max(self.count, 1)


class StepTimer:
    """Wall-clock timing of device work with explicit sync."""

    def __init__(self):
        self.meter = AverageMeter()

    @contextlib.contextmanager
    def measure(self, result_ref=None):
        t0 = time.monotonic()
        yield
        if result_ref is not None:
            jax.block_until_ready(result_ref)
        self.meter.update(time.monotonic() - t0)

    def timed(self, fn, *args, **kwargs):
        t0 = time.monotonic()
        out = fn(*args, **kwargs)
        out = jax.block_until_ready(out)
        self.meter.update(time.monotonic() - t0)
        return out

    @property
    def mean(self):
        return self.meter.avg


@contextlib.contextmanager
def profile_trace(logdir: str):
    """Capture a jax profiler trace (open with TensorBoard / xprof)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
