"""Wall-clock + device profiling.

TPU-native upgrade of /root/reference/core/visualize/profiler.py (manual
checkpoints around ``torch.cuda.synchronize()``): the same checkpoint API but
synchronized with ``block_until_ready``, plus a context manager over
``jax.profiler`` for xprof traces.
"""

from __future__ import annotations

import contextlib
import time

import jax


class Profiler:
    """Named wall-clock checkpoints; call ``report()`` for a summary."""

    def __init__(self, silent: bool = False):
        self.silent = silent
        self.timings: dict[str, float] = {}
        self.counts: dict[str, int] = {}
        self._last = time.time()

    def reset(self):
        self._last = time.time()

    def report(self, name: str, sync: bool = True):
        """Record elapsed time since the previous checkpoint under ``name``."""
        if sync:
            # flush pending device work so the interval is attributable
            jax.effects_barrier()
        now = time.time()
        dt = now - self._last
        self.timings[name] = self.timings.get(name, 0.0) + dt
        self.counts[name] = self.counts.get(name, 0) + 1
        self._last = now
        if not self.silent:
            print(f"[profiler] {name}: {dt * 1000:.2f} ms")
        return dt

    def summary(self) -> str:
        lines = []
        for name, total in sorted(self.timings.items(), key=lambda kv: -kv[1]):
            n = self.counts[name]
            lines.append(f"{name:>24}: total {total:8.3f}s  avg {total / n * 1e3:8.2f}ms  n={n}")
        return "\n".join(lines)


@contextlib.contextmanager
def device_trace(logdir: str):
    """xprof trace of the enclosed region (view with tensorboard/xprof)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
