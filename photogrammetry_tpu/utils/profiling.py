"""Stage timing + append-only run-stats log.

Reference analogues: ad-hoc time.time() deltas and the appended-JSON run log
with timestamp + hostname discriminators (de_warp.py:27-38;
data/dewarp_test/stats.json).  Adds first-class jax.profiler trace capture.
"""
from __future__ import annotations

import contextlib
import json
import os
import socket
import time
from typing import Dict, Optional


class StageTimer:
    """Accumulates wall-clock per named stage; call .block(x) on outputs to
    time device work honestly."""

    def __init__(self):
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def stage(self, name: str):
        start = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - start
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    @staticmethod
    def block(x):
        import jax

        jax.block_until_ready(x)
        return x

    def summary(self) -> Dict[str, dict]:
        return {name: {"total_s": round(self.totals[name], 6),
                       "calls": self.counts[name],
                       "mean_s": round(self.totals[name]
                                       / max(self.counts[name], 1), 6)}
                for name in sorted(self.totals)}


def append_stats(path: str, record: dict) -> None:
    """Append a run record (timestamped, host-tagged) to a JSON-list log —
    the de_warp.py:27-38 format."""
    entry = dict(record)
    entry.setdefault("timestamp", time.time())
    entry.setdefault("hostname", socket.gethostname())
    entries = []
    if os.path.isfile(path):
        with open(path) as fh:
            try:
                entries = json.load(fh)
            except json.JSONDecodeError:
                entries = []
    entries.append(entry)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as fh:
        json.dump(entries, fh, indent=1)


@contextlib.contextmanager
def profiler_trace(log_dir: Optional[str]):
    """jax.profiler trace scope (no-op when log_dir is None)."""
    if not log_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
