"""Profiling utilities (SURVEY.md §5 "Tracing / profiling" row).

The reference has no profiling at all; here: host-side stage timers for the
driver loop and a context manager around ``jax.profiler`` for device traces
(xprof-compatible; the trace.json.gz inside the output dir can be aggregated
by HLO source attribution to find hot ops — see ``summarize_trace``).
"""

from __future__ import annotations

import collections
import contextlib
import time
from typing import Dict, Optional


class StageTimer:
    """Accumulating wall-clock timer for named host-side stages."""

    def __init__(self):
        self.totals: Dict[str, float] = collections.defaultdict(float)
        self.counts: Dict[str, int] = collections.defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def summary(self) -> Dict[str, dict]:
        return {
            k: {
                "total_s": round(v, 4),
                "count": self.counts[k],
                "mean_ms": round(1000 * v / max(self.counts[k], 1), 3),
            }
            for k, v in sorted(self.totals.items(), key=lambda kv: -kv[1])
        }


@contextlib.contextmanager
def device_trace(out_dir: str):
    """Capture a device profile around a block: ``with device_trace("/tmp/t"):``."""
    import jax

    with jax.profiler.trace(out_dir):
        yield


def summarize_trace(trace_dir: str, top: int = 20) -> list:
    """Aggregate a captured trace by HLO source attribution.

    Returns ``[(total_ms, source), ...]`` sorted descending — the fastest way
    to find which line of this framework an op came from.
    """
    import collections as _c
    import glob
    import gzip
    import json

    files = sorted(glob.glob(f"{trace_dir}/plugins/profile/*/*.trace.json.gz"))
    if not files:
        raise FileNotFoundError(f"no trace files under {trace_dir}")
    with gzip.open(files[-1]) as f:
        data = json.load(f)
    by_src = _c.Counter()
    for e in data.get("traceEvents", []):
        if e.get("ph") != "X" or "dur" not in e:
            continue
        name = e.get("name", "")
        if name.startswith(("while", "conditional", "jit_", "$")) or "asarray" in name:
            continue
        src = e.get("args", {}).get("source", "?:" + name.split(".")[0])
        by_src[src] += e["dur"]
    return [(round(v / 1000, 2), k) for k, v in by_src.most_common(top)]
