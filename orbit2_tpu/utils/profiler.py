"""GPTL-style span profiler over jax.profiler (reference dist/profile.py:9-25).

Same begin/end API as the reference's `ProfileTimer` (which wraps the C GPTL
library via gptl4py), but spans are recorded both as wall-clock aggregates
(pr_summary equivalent) and as named jax.profiler TraceAnnotations so they
show up in Perfetto/XProf traces captured with `start_trace`.
"""

from __future__ import annotations

import json
import time
from collections import defaultdict
from contextlib import contextmanager
from typing import Dict, Optional

import jax


class ProfileTimer:
    def __init__(self, active: bool = True):
        self.active = active
        self._starts: Dict[str, float] = {}
        self._annotations: Dict[str, object] = {}
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    def isactive(self) -> bool:
        return self.active

    def begin(self, name: str):
        if not self.active:
            return
        ann = jax.profiler.TraceAnnotation(name)
        ann.__enter__()
        self._annotations[name] = ann
        self._starts[name] = time.perf_counter()

    def end(self, name: str):
        if not self.active or name not in self._starts:
            return
        self.totals[name] += time.perf_counter() - self._starts.pop(name)
        self.counts[name] += 1
        ann = self._annotations.pop(name, None)
        if ann is not None:
            ann.__exit__(None, None, None)

    @contextmanager
    def span(self, name: str):
        self.begin(name)
        try:
            yield
        finally:
            self.end(name)

    # ---- GPTL-style report dumps (gp.pr_file / gp.pr_summary_file) ---------

    def summary(self) -> Dict[str, Dict[str, float]]:
        return {
            name: {
                "total_s": self.totals[name],
                "count": self.counts[name],
                "mean_s": self.totals[name] / max(1, self.counts[name]),
            }
            for name in self.totals
        }

    def pr_file(self, path: str):
        with open(path, "w") as f:
            json.dump(self.summary(), f, indent=2)

    pr_summary_file = pr_file


def start_trace(log_dir: str):
    """Capture a Perfetto/XProf trace (view with xprof/tensorboard)."""
    jax.profiler.start_trace(log_dir)


def stop_trace():
    jax.profiler.stop_trace()
