"""Tracing / profiling / debug utilities.

The reference's only instrumentation is wall-clock time-per-image in eval and
``torch.autograd.set_detect_anomaly(True)`` everywhere (SURVEY.md §5.1-5.2).
TPU-native equivalents:

  * ``trace(logdir)`` — context manager around ``jax.profiler`` producing a
    TensorBoard-loadable trace of device execution;
  * ``phase_timer`` — lightweight named host-side timers (time-per-image
    parity metric lives in eval/metrics.py);
  * ``enable_nan_debugging()`` — jax_debug_nans, the analogue of torch's
    anomaly detection: re-runs the failing primitive un-jitted and raises
    with provenance.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict


@contextlib.contextmanager
def trace(logdir: str = "/tmp/jax_trace"):
    """Capture a device trace viewable in TensorBoard / Perfetto."""
    import jax
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


class PhaseTimer:
    """Accumulating named wall-clock timers.

    with timer.phase("project"): ...
    print(timer.summary())
    """

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def summary(self) -> str:
        lines = []
        for name in sorted(self.totals):
            t, n = self.totals[name], self.counts[name]
            lines.append(f"{name}: total {t:.4f}s over {n} calls "
                         f"({t / max(n, 1) * 1e3:.2f} ms/call)")
        return "\n".join(lines)


def enable_nan_debugging(enable: bool = True) -> None:
    """NaN provenance (the reference's set_detect_anomaly analogue)."""
    import jax
    jax.config.update("jax_debug_nans", enable)


def device_memory_stats() -> dict:
    """Per-device live memory statistics (bytes), when the backend reports."""
    import jax
    stats = {}
    for d in jax.devices():
        try:
            stats[str(d)] = d.memory_stats()
        except Exception:
            stats[str(d)] = None
    return stats
