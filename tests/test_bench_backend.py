"""bench.py backend resolution: probe-with-timeout + honest CPU fallback.

No reference analog — this is driver-facing infrastructure so the headline
benchmark records a real (flagged) number instead of null when the TPU
tunnel's chip claim hangs (it can stall for hours server-side).
"""

import subprocess

import bench


def test_forced_cpu_skips_probe(monkeypatch):
    monkeypatch.setenv("BENCH_BACKEND", "cpu")

    def boom(*a, **k):  # the probe must not run at all
        raise AssertionError("probe subprocess should not be spawned")

    monkeypatch.setattr(subprocess, "run", boom)
    assert bench._resolve_backend() == "cpu-fallback"


def test_forced_default_skips_probe_and_fallback(monkeypatch):
    monkeypatch.setenv("BENCH_BACKEND", "default")

    def boom(*a, **k):
        raise AssertionError("probe subprocess should not be spawned")

    monkeypatch.setattr(subprocess, "run", boom)
    assert bench._resolve_backend() is None


def test_probe_timeout_falls_back(monkeypatch):
    monkeypatch.delenv("BENCH_BACKEND", raising=False)
    monkeypatch.setenv("BENCH_PROBE_TIMEOUT", "1")

    def hang(cmd, timeout=None, **k):
        raise subprocess.TimeoutExpired(cmd, timeout)

    monkeypatch.setattr(subprocess, "run", hang)
    assert bench._resolve_backend() == "cpu-fallback"


def test_probe_failure_rc_falls_back(monkeypatch):
    monkeypatch.delenv("BENCH_BACKEND", raising=False)

    def fail(cmd, **k):
        return subprocess.CompletedProcess(cmd, returncode=1)

    monkeypatch.setattr(subprocess, "run", fail)
    assert bench._resolve_backend() == "cpu-fallback"


def test_probe_success_keeps_default(monkeypatch):
    monkeypatch.delenv("BENCH_BACKEND", raising=False)

    def ok(cmd, **k):
        return subprocess.CompletedProcess(cmd, returncode=0)

    monkeypatch.setattr(subprocess, "run", ok)
    assert bench._resolve_backend() is None
