"""Outage-proof entry protocol (runtime/backend.py): the benchmark/CLI
front door must produce a structured record whether the device backend is
alive, dead (init raises), or wedged (init blocks) — round 3 shipped a
traceback as its only bench artifact, which is the failure this pins
against."""

import subprocess
import sys

import pytest

from mvrecon_tpu.runtime import backend as be


class _Proc:
    def __init__(self, rc, out="", err=""):
        self.returncode = rc
        self.stdout = out
        self.stderr = err


def test_probe_success(monkeypatch):
    monkeypatch.setattr(
        subprocess, "run", lambda *a, **k: _Proc(0, "cpu 8\n")
    )
    rec = be.probe_backend(attempts=3, timeout_s=1.0, backoff_s=0.0)
    assert rec["ok"] and rec["platform"] == "cpu" and rec["n_devices"] == 8
    assert rec["attempts"] == 1 and rec["error"] is None


def test_probe_init_failure_retries_and_reports(monkeypatch):
    calls = []

    def fake_run(*a, **k):
        calls.append(1)
        return _Proc(1, err="RuntimeError: Unable to initialize backend 'axon'")

    monkeypatch.setattr(subprocess, "run", fake_run)
    rec = be.probe_backend(attempts=3, timeout_s=1.0, backoff_s=0.0)
    assert not rec["ok"] and rec["attempts"] == 3 and len(calls) == 3
    assert "Unable to initialize" in rec["error"]


def test_probe_wedge_times_out(monkeypatch):
    def fake_run(*a, **k):
        raise subprocess.TimeoutExpired(cmd="probe", timeout=k.get("timeout"))

    monkeypatch.setattr(subprocess, "run", fake_run)
    rec = be.probe_backend(attempts=2, timeout_s=0.5, backoff_s=0.0)
    assert not rec["ok"] and "timed out" in rec["error"]


def test_probe_pets_watchdog_each_attempt(monkeypatch):
    pets = []
    monkeypatch.setattr(
        subprocess, "run",
        lambda *a, **k: _Proc(1, err="down"),
    )
    be.probe_backend(attempts=3, timeout_s=1.0, backoff_s=0.0,
                     on_attempt=lambda: pets.append(1))
    assert len(pets) == 3


def test_require_backend_or_cpu_fallback(monkeypatch):
    monkeypatch.setattr(
        subprocess, "run", lambda *a, **k: _Proc(1, err="down")
    )
    rec = be.require_backend_or_cpu(attempts=1, timeout_s=1.0, backoff_s=0.0)
    assert not rec["ok"] and rec["fallback"] == "cpu"
    # the suite already runs on CPU, so the pin is either a no-op or
    # recorded as already-initialized — both leave the process usable
    import jax

    assert jax.default_backend() == "cpu"


def test_real_probe_subprocess_smoke():
    """One real (non-mocked) child probe against the CPU backend: proves
    _PROBE_SRC is valid source and the parser handles real output."""
    proc = subprocess.run(
        [sys.executable, "-c",
         'import jax; jax.config.update("jax_platforms", "cpu");'
         + be._PROBE_SRC],
        capture_output=True, text=True, timeout=240,
    )
    if proc.returncode != 0:  # pragma: no cover - environment-specific
        pytest.skip(f"child interpreter unavailable: {proc.stderr[-200:]}")
    platform, n = proc.stdout.split()[-2:]
    assert platform == "cpu" and int(n) >= 1


def test_enable_compilation_cache_never_raises(monkeypatch):
    """The round-3 failure site: enable_compilation_cache crashed at
    import time when backend init raised. It must degrade silently."""
    import jax

    from mvrecon_tpu.runtime import cache

    def boom():
        raise RuntimeError("Unable to initialize backend 'axon'")

    monkeypatch.setattr(jax, "default_backend", boom)
    cache.enable_compilation_cache()  # must not raise
