"""Timing, throughput, and perf logging.

Rebuild of ``lib/timing.{h,cpp}``: ``millisecond_timer``
(``lib/timing.cpp:7-34``), ``throughput(ms, pixels) → MiP/s``
(``lib/timing.cpp:3-5``), and the ``Log`` file-or-stderr sink
(``lib/timing.h:9-30``) — plus a JAX-aware ``benchmark`` helper that
synchronizes with ``block_until_ready`` around the timed loop, the analog of
``RecFilter::profile`` (``lib/recfilter.cpp:991-1016``).
"""

from __future__ import annotations

import sys
import time
from typing import Callable

import jax


def millisecond_timer() -> float:
    """Wall-clock time in milliseconds (``lib/timing.cpp:7-34``)."""
    return time.perf_counter() * 1000.0


def throughput(runtime_ms: float, pixels: int) -> float:
    """MiP/s = pixels·1000 / (runtime_ms · 2^20) (``lib/timing.cpp:3-5``)."""
    if runtime_ms <= 0.0:
        return float("inf")
    return (float(pixels) * 1000.0) / (runtime_ms * float(2**20))


def mpix_per_sec(runtime_ms: float, pixels: int) -> float:
    """Decimal Mpix/s (10^6 pixels per second) — SI variant for benchmarks."""
    if runtime_ms <= 0.0:
        return float("inf")
    return (float(pixels) * 1000.0) / (runtime_ms * 1e6)


class Log:
    """Perf log sink: writes to a file if a name is given, else stderr
    (``lib/timing.h:9-30``)."""

    def __init__(self, filename: str = ""):
        self._fh = open(filename, "w") if filename else sys.stderr

    def write(self, msg: str) -> "Log":
        self._fh.write(str(msg))
        self._fh.flush()
        return self

    def __lshift__(self, msg) -> "Log":  # log << "text" ergonomics
        return self.write(str(msg))

    def close(self):
        if self._fh is not sys.stderr:
            self._fh.close()


def benchmark(
    fn: Callable,
    *args,
    iterations: int = 10,
    warmup: int = 1,
    per_iter_sync: bool = False,
) -> float:
    """Median-free total-time benchmark matching the reference's profile loop:
    warm-up call(s), then ``iterations`` timed calls with device sync at the
    end (``lib/recfilter.cpp:998-1013``). Returns total milliseconds.

    ``per_iter_sync`` blocks after every call instead of only at the end —
    closer to the reference's per-realize synchronous timing, but hides
    dispatch pipelining; the default (sync once) measures device throughput.
    """
    for _ in range(max(warmup, 0)):
        out = fn(*args)
    jax.block_until_ready(out)
    start = millisecond_timer()
    if per_iter_sync:
        for _ in range(iterations):
            out = fn(*args)
            jax.block_until_ready(out)
    else:
        for _ in range(iterations):
            out = fn(*args)
        jax.block_until_ready(out)
    return millisecond_timer() - start
