"""Tracing, profiling and structured metric logging.

The reference's observability is ad-hoc ``time.time()`` prints
(/root/reference/datapreparation/kitti360pose/prepare.py:459-496,
training/coarse.py:109-119, evaluation/pipeline.py:180-208). This module
keeps that surface (stage timers with printed elapsed times) and adds the
TPU-native equivalents: ``jax.profiler`` trace capture around any stage and
JSONL metric logging for machine-readable run histories.
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from typing import Dict, Optional


class StageTimer:
    """Named wall-clock stage timing with a printable summary."""

    def __init__(self, log=print):
        self.log = log
        self.times: Dict[str, float] = {}

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.time()
        try:
            yield
        finally:
            elapsed = time.time() - t0
            self.times[name] = self.times.get(name, 0.0) + elapsed
            self.log(f"[{name}] {elapsed:0.2f}s")

    def summary(self) -> Dict[str, float]:
        return dict(self.times)


@contextlib.contextmanager
def profile_trace(log_dir: Optional[str]):
    """Capture a jax.profiler trace (viewable in TensorBoard/XProf) around
    a code block; no-op when log_dir is falsy."""
    if not log_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class MetricsLogger:
    """Append-only JSONL metric log: one record per call."""

    def __init__(self, path: Optional[str]):
        self.path = path
        if path:
            os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)

    def log(self, record: Dict) -> None:
        if not self.path:
            return
        with open(self.path, "a") as f:
            f.write(json.dumps({"ts": time.time(), **record}) + "\n")


def enable_nan_tripwire() -> None:
    """TPU-native equivalent of the reference's
    ``torch.autograd.set_detect_anomaly(True)`` + SuperGlue NaN prints
    (training/coarse.py:244, models/superglue.py:287-309): make any NaN in
    a jitted computation raise with a traceback."""
    import jax

    jax.config.update("jax_debug_nans", True)
