"""Per-stage wall-clock instrumentation.

Structured replacement for the reference's timer macros and commented-out
chrono spans (``/root/reference/include/timer.h:18-33``,
``tracking.cc:344-376``): named stages accumulate count/total/min/max and
export a summary dict or CSV. Device work is asynchronous under JAX, so
callers must ``block_until_ready`` before stopping a span when they want
true device time; the VO frontend does this only at profiling points.
"""

from __future__ import annotations

import contextlib
import csv
import time
from collections import defaultdict
from typing import Dict


class StageTimer:
    def __init__(self) -> None:
        self._stats: Dict[str, list] = defaultdict(lambda: [0, 0.0, float("inf"), 0.0])

    @contextlib.contextmanager
    def span(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            s = self._stats[name]
            s[0] += 1
            s[1] += dt
            s[2] = min(s[2], dt)
            s[3] = max(s[3], dt)

    def summary(self) -> Dict[str, dict]:
        return {
            name: {
                "count": s[0],
                "total_s": s[1],
                "mean_ms": 1e3 * s[1] / max(1, s[0]),
                "min_ms": 1e3 * s[2] if s[0] else 0.0,
                "max_ms": 1e3 * s[3],
            }
            for name, s in self._stats.items()
        }

    def write_csv(self, path: str) -> None:
        with open(path, "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(["stage", "count", "total_s", "mean_ms", "min_ms", "max_ms"])
            for name, d in self.summary().items():
                w.writerow([name, d["count"], f"{d['total_s']:.6f}", f"{d['mean_ms']:.3f}", f"{d['min_ms']:.3f}", f"{d['max_ms']:.3f}"])

    def reset(self) -> None:
        self._stats.clear()


@contextlib.contextmanager
def count_d2h(stats: dict, sites: dict = None):
    """Count device->host materializations (``jax.Array.__array__``) and
    the wall spent inside them into ``stats`` keys ``"n"``/``"t"`` while
    active, plus the CALLING-THREAD CPU time inside them as ``"tt"``.
    Through the dev relay each sync costs a ~24 ms round trip on the
    calling thread — and the relay client busy-polls, so the wait shows
    up as thread CPU time too; ``"tt"`` lets a measurement subtract the
    in-transfer spin from a ``time.thread_time()`` total ON THE SAME
    CLOCK (wall-minus-thread mixes clocks and clamps to zero — the
    round-3 bench defect). Locally the same sync is ~0.1-0.2 ms — the
    counts let a relay-attached measurement project locally-attached
    throughput (bench.py, scripts/profile_e2e.py). Reentrant use on the
    same dict accumulates; reset by zeroing the keys. ``sites`` (a dict)
    additionally tallies the innermost in-repo call site of each
    transfer as ``"file:line fn" -> count``."""
    import jax.numpy as jnp

    arr_t = type(jnp.zeros(()))
    orig = arr_t.__array__
    stats.setdefault("n", 0)
    stats.setdefault("t", 0.0)
    stats.setdefault("tt", 0.0)

    def counted(self, *a, **k):
        t0 = time.perf_counter()
        tt0 = time.thread_time()
        r = orig(self, *a, **k)
        stats["n"] += 1
        stats["t"] += time.perf_counter() - t0
        stats["tt"] += time.thread_time() - tt0
        if sites is not None:
            import traceback

            for fr in reversed(traceback.extract_stack(limit=25)):
                f = fr.filename
                if f.endswith("utils/timing.py"):
                    continue  # this wrapper's own frame
                if ("/ur_mvo_tpu/" in f or "/scripts/" in f
                        or f.endswith(("bench.py", "__graft_entry__.py"))):
                    key = f"{f.rsplit('/', 1)[-1]}:{fr.lineno} {fr.name}"
                    sites[key] = sites.get(key, 0) + 1
                    break
        return r

    arr_t.__array__ = counted
    try:
        yield stats
    finally:
        arr_t.__array__ = orig
