"""Tracing / profiling helpers (SURVEY.md §5 tracing).

The reference's observability was TensorBoard graph view + (maybe) a Chrome
timeline; the TPU-native equivalents are ``jax.profiler`` perfetto traces
and a lightweight step timer. Debug aids: ``debug_nans`` flag enables
``jax_debug_nans`` (SURVEY.md §5 race-detection note — functional purity
makes sanitizers unnecessary; NaN tracing is the useful knob).
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def profile_trace(logdir: Optional[str]) -> Iterator[None]:
    """Capture a jax.profiler trace (viewable in perfetto/TensorBoard)."""
    if not logdir:
        yield
        return
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def enable_debug_nans(on: bool = True) -> None:
    jax.config.update("jax_debug_nans", on)


def load_device_events(trace_dir: str) -> list:
    """Parse a ``jax.profiler`` trace dir -> device-lane complete events.

    Returns the raw chrome-trace event dicts (``ph == "X"`` with a ``dur``,
    microseconds) whose pid belongs to a device lane (process_name metadata
    contains "TPU"/"tpu" or "/device"). Shared by bench.py's latency mode
    and the bench/profile_*.py fusion profilers so device-lane detection
    cannot drift between tools.
    """
    import glob
    import gzip
    import json

    paths = sorted(glob.glob(f"{trace_dir}/**/*.trace.json.gz",
                             recursive=True))
    if not paths:
        return []
    with gzip.open(paths[-1], "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    pid_names = {e["pid"]: e["args"].get("name", "")
                 for e in events
                 if e.get("ph") == "M" and e.get("name") == "process_name"}
    dev = {p for p, n in pid_names.items()
           if "TPU" in n or "tpu" in n or "/device" in n}
    return [e for e in events
            if e.get("ph") == "X" and e.get("dur") and e.get("pid") in dev]


class StepTimer:
    """Wall-clock per-step timing with warmup-aware running stats."""

    def __init__(self, warmup: int = 2):
        self.warmup = warmup
        self.count = 0
        self.total = 0.0
        self.last = float("nan")  # nan until a step runs (0-step resumes)
        self._t0 = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        dt = time.perf_counter() - self._t0
        self.count += 1
        if self.count > self.warmup:
            self.total += dt
        self.last = dt

    @property
    def mean(self) -> float:
        n = self.count - self.warmup
        return self.total / n if n > 0 else float("nan")
