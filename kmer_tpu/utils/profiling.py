"""Tracing / profiling helpers.

TPU-native replacement for the reference's reliance on EXPLAIN ANALYZE
(SURVEY.md §5.1): jax.profiler trace annotations around pipeline phases
plus simple wall-clock phase accounting with bytes/s reporting against
a speed-of-light budget.
"""

from __future__ import annotations

import contextlib
import time

import jax


class Profile:
    """Accumulates per-phase wall time and optional byte counts."""

    def __init__(self):
        self.phases: dict[str, float] = {}
        self.bytes: dict[str, int] = {}

    def report(self, hbm_bw_bytes_per_s: float | None = None) -> str:
        lines = []
        for name, dt in sorted(self.phases.items(), key=lambda kv: -kv[1]):
            line = f"{name}: {dt * 1e3:.2f} ms"
            nbytes = self.bytes.get(name)
            if nbytes:
                gbs = nbytes / dt / 1e9
                line += f", {gbs:.1f} GB/s"
                if hbm_bw_bytes_per_s:
                    line += f" ({100 * nbytes / dt / hbm_bw_bytes_per_s:.0f}% of SoL)"
            lines.append(line)
        return "\n".join(lines)


@contextlib.contextmanager
def phase_timer(profile: Profile | None, name: str, nbytes: int = 0, sync=None):
    """Times a phase (blocking on `sync` if given) and annotates the
    jax profiler trace so phases show up in xprof captures."""
    with jax.profiler.TraceAnnotation(name):
        t0 = time.perf_counter()
        yield
        if sync is not None:
            jax.block_until_ready(sync)
        dt = time.perf_counter() - t0
    if profile is not None:
        profile.phases[name] = profile.phases.get(name, 0.0) + dt
        if nbytes:
            profile.bytes[name] = profile.bytes.get(name, 0) + nbytes
