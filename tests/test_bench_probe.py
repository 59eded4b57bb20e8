"""bench._probe_backend: env gating + bounded-probe fallback behavior."""

import subprocess

import bench


def test_explicit_cpu_env_is_not_a_fallback(monkeypatch):
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")

    def boom(*a, **k):  # the probe must not even run
        raise AssertionError("probe subprocess should be skipped for cpu")

    monkeypatch.setattr(subprocess, "run", boom)
    assert bench._probe_backend(timeout_s=1) == "cpu"


def test_healthy_backend_passes_through(monkeypatch):
    monkeypatch.setenv("JAX_PLATFORMS", "axon")

    class OK:
        returncode = 0

    monkeypatch.setattr(subprocess, "run", lambda *a, **k: OK())
    assert bench._probe_backend(timeout_s=1) == "axon"


def test_unset_env_still_probes(monkeypatch):
    monkeypatch.delenv("JAX_PLATFORMS", raising=False)

    class OK:
        returncode = 0

    calls = []

    def run(*a, **k):
        calls.append(a)
        return OK()

    monkeypatch.setattr(subprocess, "run", run)
    assert bench._probe_backend(timeout_s=1) == "default"
    assert calls, "auto-discovered backends must be probed too"


def test_hang_falls_back(monkeypatch):
    monkeypatch.setenv("JAX_PLATFORMS", "axon")

    def run(*a, **k):
        raise subprocess.TimeoutExpired(cmd="jax", timeout=1)

    monkeypatch.setattr(subprocess, "run", run)
    assert bench._probe_backend(timeout_s=1) == "fallback"


def test_init_error_falls_back(monkeypatch):
    monkeypatch.setenv("JAX_PLATFORMS", "axon")

    class Fail:
        returncode = 1

    monkeypatch.setattr(subprocess, "run", lambda *a, **k: Fail())
    assert bench._probe_backend(timeout_s=1) == "fallback"
