"""Tracing / profiling hooks — a subsystem the reference lacks entirely
(SURVEY.md §5: only tqdm progress bars).

- :func:`trace`: context manager around ``jax.profiler`` producing a
  TensorBoard-loadable trace directory.
- :class:`StepTimer`: a callback for the train loops' callback protocol
  recording per-step wall time and derived throughput.
- :func:`annotate`: named trace spans for host-side phases.
"""

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device profile into ``log_dir`` (view with TensorBoard)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named span in the profiler timeline for host-side phases."""
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Train-loop callback recording per-step wall time.

    Pass as a callback: ``train_paired(..., callbacks=[timer])`` — it uses
    the 1-arg locals protocol.  ``timer.summary()`` reports steps/sec and
    patches/sec (excluding the first ``warmup`` compile-laden steps).
    """

    def __init__(self, warmup: int = 2):
        self.times = []
        self.batch_sizes = []
        self.warmup = warmup
        self._last = None

    def __call__(self, loop_locals):
        now = time.perf_counter()
        if self._last is not None:
            self.times.append(now - self._last)
            self.batch_sizes.append(loop_locals.get("n_valid", 0))
        self._last = now

    def summary(self):
        times = self.times[self.warmup :]
        sizes = self.batch_sizes[self.warmup :]
        if not times:
            return {}
        total = sum(times)
        return {
            "steps": len(times),
            "mean_step_ms": 1000 * total / len(times),
            "steps_per_sec": len(times) / total,
            "patches_per_sec": sum(sizes) / total,
        }
