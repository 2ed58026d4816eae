"""Phase-scoped profiler tracing (egonn_tpu/utils/tracing.py — SURVEY §5).

The reference has no tracing at all (tqdm + a RANSAC wall clock); the TPU
build wraps its train/eval phases in jax.profiler captures gated by
EGONN_TRACE_DIR.  These tests pin the gating contract: off by default,
produces an xprof trace dir when enabled, and a nested capture degrades to a
no-op instead of crashing (jax.profiler forbids nesting).
"""
import os

import jax
import jax.numpy as jnp

from egonn_tpu.utils import tracing


def test_capture_noop_without_env(monkeypatch, tmp_path):
    monkeypatch.delenv("EGONN_TRACE_DIR", raising=False)
    with tracing.capture("x"):
        pass
    with tracing.annotate("y"):
        pass
    with tracing.step_annotation("z", step_num=0):
        pass
    assert not os.path.exists(str(tmp_path / "x"))


def test_capture_writes_trace(monkeypatch, tmp_path):
    monkeypatch.setenv("EGONN_TRACE_DIR", str(tmp_path))
    f = jax.jit(lambda x: x * 2 + 1)
    with tracing.capture("unit"):
        with tracing.annotate("phase"):
            jax.block_until_ready(f(jnp.arange(8.0)))
    d = str(tmp_path / "unit")
    files = [os.path.join(r, fn) for r, _, fns in os.walk(d) for fn in fns]
    assert files, "profiler capture produced no trace files"


def test_nested_capture_degrades_to_noop(monkeypatch, tmp_path):
    monkeypatch.setenv("EGONN_TRACE_DIR", str(tmp_path))
    with tracing.capture("outer"):
        inner = tracing.capture("inner")
        with inner:
            pass
    # inner must not have started a second profiler session
    assert not os.path.exists(str(tmp_path / "inner"))
    # and the guard resets: a fresh capture works again
    assert not tracing._capture_active


def test_capture_disabled_flag(monkeypatch, tmp_path):
    monkeypatch.setenv("EGONN_TRACE_DIR", str(tmp_path))
    with tracing.capture("off", enabled=False):
        pass
    assert not os.path.exists(str(tmp_path / "off"))
