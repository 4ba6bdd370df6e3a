"""Tracing / profiling utilities.

The reference's only observability is tqdm bars and a wall-clock solve time
(SURVEY.md section 5.1). Here: a ``jax.profiler`` trace context for device
timelines, phase timers for the compression pipeline, and a structured
event log (replacing the reference quantizers' ``outlier_log.csv`` side
files, ``quantization.py:126-136``).
"""

from __future__ import annotations

import contextlib
import json
import time
from typing import Dict, List, Optional


class PhaseTimer:
    """Named wall-clock phases with a JSON-serializable summary."""

    def __init__(self):
        self.phases: Dict[str, float] = {}
        self._order: List[str] = []

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.time()
        try:
            yield
        finally:
            dt = time.time() - t0
            self.phases[name] = self.phases.get(name, 0.0) + dt
            if name not in self._order:
                self._order.append(name)

    def summary(self) -> Dict[str, float]:
        return {name: round(self.phases[name], 4) for name in self._order}

    def __str__(self):
        return json.dumps(self.summary())


@contextlib.contextmanager
def device_trace(log_dir: Optional[str] = None):
    """``jax.profiler`` trace scope; no-op when ``log_dir`` is None.

    View the result with TensorBoard's profile plugin or xprof.
    """
    if log_dir is None:
        yield
        return
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class EventLog:
    """Structured replacements for print/CSV side-channel telemetry."""

    def __init__(self):
        self.events: List[dict] = []

    def log(self, kind: str, **fields):
        self.events.append({"kind": kind, "t": time.time(), **fields})

    def of_kind(self, kind: str) -> List[dict]:
        return [e for e in self.events if e["kind"] == kind]

    def dump(self, path: str):
        with open(path, "w") as f:
            for e in self.events:
                f.write(json.dumps(e) + "\n")
