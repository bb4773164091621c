"""Tracing / profiling hooks (SURVEY.md §5.1 — absent in the reference).

The reference's only observability is tqdm postfixes; here we expose:

- :func:`trace` — context manager around ``jax.profiler`` emitting a
  TensorBoard-compatible trace directory (XLA/TPU timeline).
- :class:`StageTimer` — lightweight wall-clock counters per pipeline stage
  (host-side; call ``block_until_ready`` on device values before stopping a
  stage for honest numbers).
- :func:`annotate` — ``jax.profiler.TraceAnnotation`` wrapper so pipeline
  stages show up named in the device trace.
"""

from __future__ import annotations

import contextlib
import os
import time
from collections import defaultdict
from typing import Dict, Iterator, Optional

import jax


def profile_dir() -> Optional[str]:
    """The ``PRGPT_PROFILE`` output directory, or None when profiling is off.

    Setting ``PRGPT_PROFILE=<dir>`` turns on stage timing + a device trace
    capture in the production loops (Trainer.train, Generator.generate):
    each prints a StageTimer breakdown at exit and drops a
    TensorBoard-compatible ``jax.profiler`` trace of a few steady-state
    steps under ``<dir>``.
    """
    return os.environ.get("PRGPT_PROFILE") or None


@contextlib.contextmanager
def trace(log_dir: str, *, create_perfetto_link: bool = False) -> Iterator[None]:
    """Capture a jax.profiler trace of the enclosed block."""
    jax.profiler.start_trace(log_dir,
                             create_perfetto_link=create_perfetto_link)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTraceCapture:
    """Capture a ``jax.profiler`` trace of steps [start, stop) of a loop.

    Drives ``start_trace``/``stop_trace`` from per-step ``tick()`` calls —
    call ``tick()`` at the END of each loop iteration — so loops need no
    structural changes; ``close()`` (idempotent) stops a still-open trace
    when the loop ends before ``stop``.
    """

    def __init__(self, log_dir: str, *, start: int = 2, stop: int = 5):
        self.log_dir = log_dir
        self.start = start
        self.stop = stop
        self._step = 0
        self._tracing = False

    @property
    def tracing(self) -> bool:
        """True while the jax.profiler trace is open.

        Wall-clock timing (StageTimer) must skip steps that run under an
        open trace: the tracer serializes tunnel dispatch (~4x wall on the
        axon chip), so timed-while-traced stages misattribute the
        bottleneck. The production loops gate their StageTimer on this.
        """
        return self._tracing

    def tick(self) -> None:
        if self._step == self.start and not self._tracing:
            jax.profiler.start_trace(self.log_dir)
            self._tracing = True
        self._step += 1
        if self._step >= self.stop:
            self.close()

    def close(self) -> None:
        if self._tracing:
            jax.profiler.stop_trace()
            self._tracing = False


def annotate(name: str):
    """Named region for the device timeline (TraceAnnotation)."""
    return jax.profiler.TraceAnnotation(name)


class StageTimer:
    """Accumulating wall-clock timers keyed by stage name.

    Example::

        timer = StageTimer()
        with timer.stage("splat"):
            depth.block_until_ready()
        print(timer.summary())
    """

    def __init__(self):
        self._total: Dict[str, float] = defaultdict(float)
        self._count: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self._total[name] += time.perf_counter() - t0
            self._count[name] += 1

    def totals(self) -> Dict[str, float]:
        return dict(self._total)

    def summary(self) -> str:
        lines = []
        for name in sorted(self._total, key=self._total.get, reverse=True):
            t, c = self._total[name], self._count[name]
            lines.append(f"{name}: {t:.3f}s total / {c} calls "
                         f"({1e3 * t / max(c, 1):.1f} ms avg)")
        return "\n".join(lines)

    def reset(self) -> None:
        self._total.clear()
        self._count.clear()
