"""Phase-scoped profiler tracing (SURVEY §5: the reference has no tracing at
all — only tqdm and the RANSAC wall clock; the TPU build wraps its phases in
jax.profiler traces).

Gated by EGONN_TRACE_DIR=<dir>: when set, the trainer captures one full epoch
(EGONN_TRACE_EPOCH, default 2 — past the compile storm) and the GL evaluator
captures one evaluation, each into its own xprof/TensorBoard trace directory.
Host-level phases are labeled with TraceAnnotations (batch_prep, train_step,
eval_embed, eval_ransac) so the trace viewer separates input-pipeline time
from device steps; the on-device substructure is visible through XLA op
metadata within each step.

bench.py has the matching capture mode (EGONN_BENCH_TRACE) for the pure
inference hot path.
"""
from __future__ import annotations

import contextlib
import os


def trace_dir() -> str | None:
    return os.environ.get("EGONN_TRACE_DIR") or None


def trace_epoch() -> int:
    return int(os.environ.get("EGONN_TRACE_EPOCH", "2"))


_capture_active = False


@contextlib.contextmanager
def _guarded_trace(path: str):
    global _capture_active
    import jax

    _capture_active = True
    try:
        with jax.profiler.trace(path):
            yield
    finally:
        _capture_active = False


def capture(subdir: str, enabled: bool = True):
    """Context manager: jax.profiler.trace into EGONN_TRACE_DIR/<subdir>, or a
    no-op when tracing is off / disabled for this call.  jax.profiler forbids
    nested captures, so a capture that would nest inside an active one (e.g.
    an in-training eval landing inside the traced epoch) degrades to a no-op
    instead of crashing."""
    base = trace_dir()
    if not (base and enabled) or _capture_active:
        return contextlib.nullcontext()

    path = os.path.join(base, subdir)
    os.makedirs(path, exist_ok=True)
    print(f"[trace] capturing profiler trace -> {path}")
    return _guarded_trace(path)


def annotate(name: str, **kwargs):
    """TraceAnnotation when tracing is active this process, else no-op.
    Cheap enough to leave on unconditionally, but gating keeps the default
    path completely untouched."""
    if trace_dir() is None:
        return contextlib.nullcontext()
    import jax

    return jax.profiler.TraceAnnotation(name, **kwargs)


def step_annotation(name: str, step_num: int):
    """StepTraceAnnotation: marks train-step boundaries for the trace viewer's
    step-time analysis."""
    if trace_dir() is None:
        return contextlib.nullcontext()
    import jax

    return jax.profiler.StepTraceAnnotation(name, step_num=step_num)
