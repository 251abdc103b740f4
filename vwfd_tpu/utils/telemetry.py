"""Observability: scalar logging + TPU profiler traces.

Replaces the reference's TensorBoard `SummaryWriter('runs/<task>')` with two
scalars per step (models/IRNcrop_model.py:78,399-400) and adds what it lacks
(SURVEY.md §5 'Tracing/profiling: none'): `jax.profiler` trace capture around
training steps, viewable in TensorBoard/Perfetto.
"""

import contextlib
import json
import os
import time
from typing import Optional


class ScalarLogger:
    """JSONL scalar stream + optional TensorBoard (torch.utils.tensorboard
    if available — torch is CPU-only here and only used for event writing)."""

    def __init__(self, logdir: str, use_tensorboard: bool = True):
        os.makedirs(logdir, exist_ok=True)
        self._f = open(os.path.join(logdir, "scalars.jsonl"), "a")
        self._tb = None
        if use_tensorboard:
            try:
                from torch.utils.tensorboard.writer import SummaryWriter
                self._tb = SummaryWriter(logdir)
            except Exception:
                self._tb = None

    def log(self, step: int, **scalars):
        rec = {"step": step, "time": time.time()}
        rec.update({k: float(v) for k, v in scalars.items()})
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()
        if self._tb is not None:
            for k, v in scalars.items():
                self._tb.add_scalar(k, float(v), global_step=step)

    def close(self):
        self._f.close()
        if self._tb is not None:
            self._tb.close()


@contextlib.contextmanager
def profile_trace(logdir: str, enabled: bool = True):
    """Capture a `jax.profiler` trace of the enclosed steps."""
    if not enabled:
        yield
        return
    import jax
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def step_annotation(name: str):
    """Named sub-trace (shows up in the profiler timeline)."""
    import jax
    with jax.profiler.TraceAnnotation(name):
        yield
