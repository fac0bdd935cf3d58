"""Tracing / profiling subsystem (SURVEY §5 aux table).

The reference's only instrumentation is an unused Timer context manager and
a per-detect wall-clock log (`utils/general.py:88-127`,
`inference/detector.py:302-323`). TPU-native replacements:

  * `trace(dir)` -- jax.profiler trace context; view in TensorBoard or
    Perfetto. Wrap any region: `with trace('/tmp/tb'): pipeline(x)`.
  * `annotate(name)` -- named sub-region inside a trace
    (jax.profiler.TraceAnnotation), shows up on the TPU timeline.
  * `StageTimer` -- lightweight per-stage wall-clock accumulation with
    device sync, for quick what-is-slow breakdowns without a full trace.
  * `xla_dump(dir)` -- env hook to dump HLO before/after optimization for
    fusion inspection (set BEFORE the first jit of interest).
  * `memory_stats()` -- per-device HBM usage snapshot.
"""

from __future__ import annotations

import contextlib
import os
import time
from collections import defaultdict
from typing import Dict, Iterator, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str, create_perfetto_link: bool = False) -> Iterator[None]:
    jax.profiler.start_trace(log_dir,
                             create_perfetto_link=create_perfetto_link)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region on the device timeline (usable as context manager)."""
    return jax.profiler.TraceAnnotation(name)


class StageTimer:
    """Accumulate wall-clock per named stage, syncing the device each exit.

    >>> t = StageTimer()
    >>> with t.stage('forward'):
    ...     out = fwd(x)            # blocked on exit
    >>> t.summary()
    {'forward': {'total_s': ..., 'count': ..., 'mean_ms': ...}}
    """

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)
        self._last_result = None

    @contextlib.contextmanager
    def stage(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if self._last_result is not None:
                jax.block_until_ready(self._last_result)
                self._last_result = None
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def observe(self, result):
        """Register device output to block on at stage exit."""
        self._last_result = result
        return result

    def summary(self) -> Dict[str, Dict[str, float]]:
        return {
            name: {
                'total_s': self.totals[name],
                'count': self.counts[name],
                'mean_ms': 1000 * self.totals[name] / max(self.counts[name], 1),
            }
            for name in self.totals
        }

    def reset(self) -> None:
        self.totals.clear()
        self.counts.clear()


def xla_dump(dump_dir: str) -> None:
    """Request HLO dumps for subsequently-compiled programs."""
    flags = os.environ.get('XLA_FLAGS', '')
    os.environ['XLA_FLAGS'] = (
        f'{flags} --xla_dump_to={dump_dir} '
        '--xla_dump_hlo_as_text').strip()


def memory_stats() -> Dict[str, Optional[Dict]]:
    out = {}
    for d in jax.devices():
        try:
            out[str(d)] = d.memory_stats()
        except Exception:
            out[str(d)] = None
    return out
