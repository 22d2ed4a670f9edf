"""First-class device tracing/profiling.

The reference only has ad-hoc wall timers (test.py:70,105-107,
demo.py:507-580).  Here profiling is a subsystem (SURVEY.md §5.1): XLA
device traces via jax.profiler, viewable in TensorBoard/Perfetto, plus
lightweight named scopes that label the model stages inside the compiled
program, and a wall-clock stage timer for host-side pipelines.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Iterator, Optional

import jax


@contextlib.contextmanager
def device_trace(log_dir: Optional[str]) -> Iterator[None]:
    """Capture an XLA device trace to `log_dir` (no-op when None).

    View with: tensorboard --logdir <log_dir>  (Profile tab) or load the
    .trace.json.gz into Perfetto.
    """
    if not log_dir:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def stage_scope(name: str):
    """Label a model stage inside jit-compiled code (shows up in traces)."""
    return jax.named_scope(name)


class StageTimer:
    """Host-side cumulative stage timer (reference demo.py:507-580 pattern)."""

    def __init__(self):
        import threading

        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}
        # apps/test.py shares one timer across postproc worker threads; the
        # read-modify-write accumulation must not lose updates (ADVICE r3)
        self._lock = threading.Lock()

    @contextlib.contextmanager
    def stage(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            with self._lock:
                self.totals[name] = self.totals.get(name, 0.0) + dt
                self.counts[name] = self.counts.get(name, 0) + 1

    def summary(self) -> Dict[str, float]:
        """Mean seconds per stage."""
        return {
            k: self.totals[k] / max(self.counts[k], 1) for k in self.totals
        }

    def report(self) -> str:
        return "  ".join(
            f"{k}={v * 1000:.1f}ms" for k, v in sorted(self.summary().items())
        )
