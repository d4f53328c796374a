"""Region-based wall-clock profiler.

The analog of the reference's wclock_on/wclock_off region profiler
(ROMS/Utility/timers.F:2-564; region taxonomy in mod_strings.F:162-240):
named regions accumulate wall time and are reported as a percentage table.
For on-device detail use `trace()` which wraps jax.profiler.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import jax


class Profiler:
    def __init__(self):
        self.acc = defaultdict(float)
        self.calls = defaultdict(int)
        self._t0 = time.perf_counter()

    @contextlib.contextmanager
    def region(self, name: str, sync: bool = False):
        """Accumulate wall time of a named region.  sync=True blocks on
        device work so the time is attributable (use sparingly)."""
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync:
                jax.effects_barrier()
            self.acc[name] += time.perf_counter() - t0
            self.calls[name] += 1

    def report(self) -> str:
        """Percentage table like the reference's finalize report."""
        total = time.perf_counter() - self._t0
        lines = ["", " Elapsed wall CPU time for each process (seconds):",
                 ""]
        for name, t in sorted(self.acc.items(), key=lambda kv: -kv[1]):
            lines.append(f"  {name:<42s} {t:12.3f}  "
                         f"({100.0 * t / max(total, 1e-12):6.4f} %)")
        lines.append(f"  {'Total':<42s} {total:12.3f}")
        return "\n".join(lines)


@contextlib.contextmanager
def trace(logdir: str = "/tmp/roms_tpu_trace"):
    """XLA-level trace (view with TensorBoard / xprof)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
