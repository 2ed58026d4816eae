"""bench.py supervisor: the round-4 failure-mode fix, pinned.

Round 4's scoreboard entry was erased by a single tunnel flap: the old bench
probed once, fell back to CPU, and recorded 0.64 clouds/s (VERDICT r4,
"what went wrong").  The supervisor now runs the measurement in a timed
subprocess and retries across flaps within a budget before an honest CPU
fallback.  These tests drive `bench.supervise()` with a faked
`subprocess.run` (no device, no real bench child) and pin the contract:

- a clean child's last JSON line is reprinted verbatim (the driver parses
  stdout's single JSON line);
- a timed-out / aborted attempt (TimeoutExpired, rc=3 REQUIRE_TPU abort,
  rc=124 cell timeout) is retried, and a later success still lands;
- a persistent real error (rc!=0 not in the retryable set) stops burning the
  budget after two attempts and falls through to the in-process fallback;
- an exhausted budget reaches the in-process fallback exactly once.
"""
import json
import subprocess
import sys

import pytest

sys.path.insert(0, "/root/repo")
import bench


JSON_LINE = json.dumps({"metric": "m", "value": 123.0, "unit": "clouds/s"})


class _Result:
    def __init__(self, returncode=0, stdout="", stderr=""):
        self.returncode = returncode
        self.stdout = stdout
        self.stderr = stderr


def _patch_common(monkeypatch):
    # instant retries; budget small enough that the while-loop exit is
    # reachable within milliseconds of real monotonic time
    monkeypatch.setattr("time.sleep", lambda s: None)
    monkeypatch.setenv("EGONN_BENCH_ATTEMPT_TIMEOUT", "0.05")
    monkeypatch.setenv("EGONN_BENCH_BUDGET", "0.2")


def test_clean_child_line_reprinted(monkeypatch, capsys):
    _patch_common(monkeypatch)
    calls = []

    def fake_run(cmd, timeout, env, capture_output, text):
        calls.append(cmd)
        # child attempts must run bench.py itself with the child marker set
        assert cmd[0] == sys.executable and cmd[1].endswith("bench.py")
        assert env["EGONN_BENCH_CHILD"] == "1"
        assert env["EGONN_BENCH_REQUIRE_TPU"] == "1"
        return _Result(0, "noise line\n" + JSON_LINE + "\n")

    monkeypatch.setattr("subprocess.run", fake_run)
    monkeypatch.setattr(bench, "main", lambda child=False: pytest.fail(
        "fallback must not run on a clean attempt"))
    assert bench.supervise() == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert out[-1] == JSON_LINE  # the driver reads exactly this line
    assert len(calls) == 1


@pytest.mark.parametrize("first", ["timeout", 3, 124])
def test_flap_then_success_is_retried(monkeypatch, capsys, first):
    _patch_common(monkeypatch)
    attempts = []

    def fake_run(cmd, timeout, env, capture_output, text):
        attempts.append(1)
        if len(attempts) == 1:
            if first == "timeout":
                raise subprocess.TimeoutExpired(cmd, timeout)
            return _Result(first, "", "probe failed")
        return _Result(0, JSON_LINE + "\n")

    monkeypatch.setattr("subprocess.run", fake_run)
    monkeypatch.setattr(bench, "main", lambda child=False: pytest.fail(
        "fallback must not run when a retry succeeds"))
    assert bench.supervise() == 0
    assert len(attempts) == 2
    assert capsys.readouterr().out.strip().splitlines()[-1] == JSON_LINE


def test_persistent_error_stops_after_two_attempts(monkeypatch):
    _patch_common(monkeypatch)
    attempts = []
    fallback = []

    def fake_run(cmd, timeout, env, capture_output, text):
        attempts.append(1)
        return _Result(1, "", "ImportError: boom")

    monkeypatch.setattr("subprocess.run", fake_run)
    monkeypatch.setattr(bench, "main",
                        lambda child=False: fallback.append(child))
    assert bench.supervise() == 0
    assert len(attempts) == 2  # rc=1 is not retryable past attempt 2
    assert fallback == [True]  # honest in-process fallback ran once


def test_budget_exhaustion_reaches_fallback_once(monkeypatch):
    _patch_common(monkeypatch)
    fallback = []

    def fake_run(cmd, timeout, env, capture_output, text):
        raise subprocess.TimeoutExpired(cmd, timeout)

    monkeypatch.setattr("subprocess.run", fake_run)
    monkeypatch.setattr(bench, "main",
                        lambda child=False: fallback.append(child))
    assert bench.supervise() == 0
    assert fallback == [True]


def test_empty_stdout_success_is_not_a_result(monkeypatch):
    """rc=0 with no JSON line (e.g. a wrapper swallowed the command) must not
    be reported as a bench result — it retries, then falls back."""
    _patch_common(monkeypatch)
    fallback = []

    def fake_run(cmd, timeout, env, capture_output, text):
        return _Result(0, "", "")

    monkeypatch.setattr("subprocess.run", fake_run)
    monkeypatch.setattr(bench, "main",
                        lambda child=False: fallback.append(child))
    assert bench.supervise() == 0
    assert fallback == [True]
