"""Tracing / timing utilities — the reference's ad-hoc ``time.time()`` deltas
and AverageMeters (SURVEY.md §5) replaced with jax.profiler traces and an
honest device timer.

``device_time``: on tunnelled TPU runtimes ``block_until_ready`` can return
before execution completes, under-reporting by orders of magnitude; the only
reliable measurement wraps the function in a feedback ``lax.scan`` (each
iteration consumes the previous output, so nothing is loop-invariant) and
fetches a reduced scalar with ``device_get``.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace context (view with TensorBoard / xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def _feedback_many(fn: Callable, iters: int):
    @jax.jit
    def many(x):
        def body(x, _):
            return fn(x), ()
        x, _ = jax.lax.scan(body, x, None, length=iters)
        return jnp.sum(jnp.stack([jnp.sum(l) for l in
                                  jax.tree_util.tree_leaves(x)]))
    return many


def device_time(fn: Callable, x0, iters: int = 10, warmup: bool = True):
    """Honest per-iteration device time of ``fn: x -> x_like`` in seconds.

    NOTE: each measurement carries a fixed ~35-40 ms cost on this tunnelled
    runtime (the device_get round trip), so the per-iteration figure is
    inflated by ~40e-3/iters.  Use ``device_time_slope`` (or iters >= 200)
    when that bias matters — i.e. for anything under a few ms.
    """
    many = _feedback_many(fn, iters)
    if warmup:
        jax.device_get(many(x0))
    t0 = time.perf_counter()
    jax.device_get(many(x0))
    return (time.perf_counter() - t0) / iters


def device_time_slope(fn: Callable, x0, n1: int = 30, n2: int = 150,
                      repeats: int = 3):
    """Fixed-cost-free per-iteration device time: run the feedback scan at two
    iteration counts and take the slope, cancelling the ~35-40 ms per-call
    device_get floor that inflates short measurements (measured in
    tools/ubench_pallas.py E5/E6)."""
    many1 = _feedback_many(fn, n1)
    many2 = _feedback_many(fn, n2)
    jax.device_get(many1(x0))
    jax.device_get(many2(x0))
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        jax.device_get(many1(x0))
        t1 = time.perf_counter()
        jax.device_get(many2(x0))
        t2 = time.perf_counter()
        best = min(best, ((t2 - t1) - (t1 - t0)) / (n2 - n1))
    return best


class Timer:
    """Wall-clock section timer with an AverageMeter, mirroring the
    proc_timer/loop_timer pattern of demo_MiddleBury.py:251-333."""

    def __init__(self):
        from vfidkr_tpu.utils.meters import AverageMeter
        self.meter = AverageMeter()
        self._t0 = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.meter.update(time.perf_counter() - self._t0)
        return False
