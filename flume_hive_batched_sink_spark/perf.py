"""Lightweight component timers for the bench's build/serve split.

The two per-run-rebuild ANN operators (ns_similarity_ivfpq,
stream_ann_serve) and the persisted-index serving path conflate index
BUILD cost with steady-state QUERY cost when timed end-to-end — the
r12 bench row overstated serving cost ~40× (r12 verdict #4). The
operators record their build/serve phases here; bench.py snapshots
the counters around each timed pass and emits {build_s, query_s}
components next to the headline number.

Driver-side wall clock only — never inside executor-side code.
"""

from __future__ import annotations

import time
from contextlib import contextmanager

TIMERS: dict[str, float] = {}


@contextmanager
def timed(key: str):
    """Accumulate elapsed wall seconds under `key` (driver-side)."""
    t0 = time.perf_counter()
    try:
        yield
    finally:
        TIMERS[key] = TIMERS.get(key, 0.0) + (time.perf_counter() - t0)


def snapshot() -> dict[str, float]:
    """Copy of the current counters (bench.py deltas two of these)."""
    return dict(TIMERS)


def delta(before: dict[str, float], key: str) -> float:
    """Seconds accumulated under `key` since `before` was taken."""
    return TIMERS.get(key, 0.0) - before.get(key, 0.0)
