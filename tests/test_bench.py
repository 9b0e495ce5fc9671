"""Regression guards for bench.py's driver-facing orchestration.

The round-4 official bench was lost (rc=124, nothing parseable) because
the orchestration layer had three defects: child stderr discarded, one
output line printed only at the very end, and an uncaught
TimeoutExpired (VERDICT r4 weak-1).  These tests pin the fixed
behaviors with a faked subprocess so no chip time is needed:
the retry ladder, the transient same-batch retry, TimeoutExpired
stepping the ladder, the wall-clock budget skip, and main() printing
the headline record the moment it is measured.
"""
import json
import subprocess
import time

import pytest

import bench


def _proc(stdout="", stderr="", rc=0):
    return subprocess.CompletedProcess(args=[], returncode=rc,
                                       stdout=stdout, stderr=stderr)


def _far_deadline():
    return time.monotonic() + 10_000


def test_attempts_returns_first_json_record(monkeypatch):
    rec = {"metric": "m", "value": 1.0}
    calls = []

    def fake_run(cmd, **kw):
        calls.append(cmd)
        return _proc(stdout="noise\n" + json.dumps(rec) + "\n")

    monkeypatch.setattr(bench.subprocess, "run", fake_run)
    out = bench._subprocess_attempts("--run", 96, _far_deadline())
    assert out == rec
    assert len(calls) == 1 and calls[0][-1] == "96"


def test_attempts_halves_batch_on_hard_failure(monkeypatch, capsys):
    calls = []

    def fake_run(cmd, **kw):
        calls.append(int(cmd[-1]))
        if int(cmd[-1]) > 24:
            return _proc(stderr="RESOURCE_EXHAUSTED: out of memory", rc=1)
        return _proc(stdout=json.dumps({"value": 2.0}))

    monkeypatch.setattr(bench.subprocess, "run", fake_run)
    out = bench._subprocess_attempts("--run", 96, _far_deadline())
    assert out == {"value": 2.0}
    assert calls == [96, 48, 24]
    # the child's stderr tail must be echoed for diagnosability
    err = capsys.readouterr().err
    assert "RESOURCE_EXHAUSTED" in err


def test_attempts_retries_same_batch_once_on_transient(monkeypatch):
    calls = []
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)

    def fake_run(cmd, **kw):
        calls.append(int(cmd[-1]))
        if len(calls) == 1:
            return _proc(stderr="chip already in use by another client",
                         rc=1)
        return _proc(stdout=json.dumps({"value": 3.0}))

    monkeypatch.setattr(bench.subprocess, "run", fake_run)
    out = bench._subprocess_attempts("--run", 96, _far_deadline())
    assert out == {"value": 3.0}
    # transient failure retries the SAME batch, never halves
    assert calls == [96, 96]


def test_attempts_transient_retry_budget_is_one(monkeypatch):
    calls = []
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)

    def fake_run(cmd, **kw):
        calls.append(int(cmd[-1]))
        return _proc(stderr="device unavailable", rc=1)

    monkeypatch.setattr(bench.subprocess, "run", fake_run)
    out = bench._subprocess_attempts("--run", 16, _far_deadline(),
                                     min_batch=8)
    assert out is None
    # one same-batch retry, then the ladder halves as usual
    assert calls == [16, 16, 8]


def test_attempts_catches_timeout_expired(monkeypatch):
    calls = []

    def fake_run(cmd, **kw):
        calls.append(int(cmd[-1]))
        if len(calls) == 1:
            raise subprocess.TimeoutExpired(cmd, timeout=10,
                                            stderr=b"slow compile")
        return _proc(stdout=json.dumps({"value": 4.0}))

    monkeypatch.setattr(bench.subprocess, "run", fake_run)
    # must NOT raise (the r4 bench would have died here)
    out = bench._subprocess_attempts("--run", 96, _far_deadline())
    assert out == {"value": 4.0}
    assert calls == [96, 48]


def test_attempts_respects_deadline(monkeypatch):
    def fake_run(cmd, **kw):  # pragma: no cover - must not be reached
        raise AssertionError("attempt launched past the deadline")

    monkeypatch.setattr(bench.subprocess, "run", fake_run)
    out = bench._subprocess_attempts("--run", 96,
                                     time.monotonic() + 30)
    assert out is None


def test_main_prints_headline_immediately_then_enriches(monkeypatch,
                                                        capsys):
    headline = {"metric": "x2", "value": 1.78, "vs_baseline": 0.9}
    train = {"metric": "train", "value": 366.0}
    seen = []

    def fake_attempts(mode, bs, deadline, min_batch=4):
        seen.append(mode)
        if mode == "--run":
            return dict(headline)
        if mode == "--train-run":
            return dict(train)
        return None  # x3/x4 fail -> record must survive unenriched

    monkeypatch.setattr(bench, "_subprocess_attempts", fake_attempts)
    monkeypatch.setattr(bench.sys, "argv", ["bench.py"])
    bench.main()
    lines = [json.loads(ln) for ln in capsys.readouterr().out.splitlines()
             if ln.startswith("{")]
    # first record is the bare headline (survives any later kill);
    # the last record is the enriched one the driver consumes
    assert lines[0] == headline
    assert lines[-1]["train"] == train
    assert lines[-1]["value"] == 1.78
    assert seen[0] == "--run"


def test_main_emits_parseable_error_record_when_all_fail(monkeypatch,
                                                         capsys):
    monkeypatch.setattr(bench, "_subprocess_attempts",
                        lambda *a, **kw: None)
    monkeypatch.setattr(bench.sys, "argv", ["bench.py"])
    bench.main()
    lines = [json.loads(ln) for ln in capsys.readouterr().out.splitlines()
             if ln.startswith("{")]
    assert len(lines) == 1
    assert lines[0]["value"] is None and "error" in lines[0]


def test_main_skips_extras_when_budget_spent(monkeypatch, capsys):
    headline = {"metric": "x2", "value": 1.78}
    launched = []

    def fake_attempts(mode, bs, deadline, min_batch=4):
        launched.append(mode)
        return dict(headline) if mode == "--run" else {"value": 1}

    monkeypatch.setattr(bench, "_subprocess_attempts", fake_attempts)
    monkeypatch.setattr(bench.sys, "argv", ["bench.py"])
    monkeypatch.setenv("BENCH_BUDGET_S", "0")
    # deadline already passed when extras are considered: headline ran
    # (its own attempt guard is inside _subprocess_attempts, faked
    # here), extras must be skipped
    bench.main()
    assert launched == ["--run"]
    out = capsys.readouterr()
    assert json.loads(out.out.splitlines()[0]) == headline
    assert "skipping" in out.err
