"""Structured profiling / tracing.

The reference has ad-hoc `profile=False` TimeChecker blocks
(envs/env_humanoid_base.py:31-34, sim_agent.py:20-23).  The TPU equivalents:
named jax.profiler trace scopes around pipeline phases, an xprof trace
dumper, and steps/sec counters.
"""
from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def scope(name: str):
    """Named annotation visible in xprof/tensorboard traces."""
    with jax.profiler.TraceAnnotation(name):
        yield


@contextlib.contextmanager
def device_trace(logdir: str):
    """Capture a device trace viewable with tensorboard/xprof."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class Throughput:
    """Steps/sec meter (replaces the renderer FPS meter + ad-hoc timers)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self._t0 = time.perf_counter()
        self._steps = 0

    def add(self, n: int):
        self._steps += n

    @property
    def steps_per_sec(self) -> float:
        dt = time.perf_counter() - self._t0
        return self._steps / dt if dt > 0 else 0.0


def timeit(fn, *args, iters: int = 5, warmup: int = 1):
    """Wall-clock a jitted function with block_until_ready."""
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters
