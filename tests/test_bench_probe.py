"""bench._probe_backend: env gating, retry/backoff, resolved-backend label."""

import subprocess
import time

import bench


def test_explicit_cpu_env_is_not_a_fallback(monkeypatch):
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")

    def boom(*a, **k):  # the probe must not even run
        raise AssertionError("probe subprocess should be skipped for cpu")

    monkeypatch.setattr(subprocess, "run", boom)
    assert bench._probe_backend(budget_s=1) == "cpu"


class _OK:
    """Child that resolved a backend and printed jax.default_backend()."""

    returncode = 0

    def __init__(self, backend):
        self.stdout = (backend + "\n").encode()


def test_healthy_backend_reports_resolved(monkeypatch):
    monkeypatch.setenv("JAX_PLATFORMS", "axon")
    monkeypatch.setattr(subprocess, "run", lambda *a, **k: _OK("tpu"))
    # the label is what jax RESOLVED in the child, not the env request
    assert bench._probe_backend(budget_s=30) == "tpu"


def test_autoselected_cpu_is_labelled_cpu(monkeypatch):
    # ADVICE r3: a TPU-less host where jax auto-selects CPU must read "cpu"
    # (so the cpuinfo-keyed cache dir is used), not "default"
    monkeypatch.delenv("JAX_PLATFORMS", raising=False)
    calls = []

    def run(*a, **k):
        calls.append(a)
        return _OK("cpu")

    monkeypatch.setattr(subprocess, "run", run)
    assert bench._probe_backend(budget_s=30) == "cpu"
    assert calls, "auto-discovered backends must be probed too"


def test_hang_retries_then_falls_back(monkeypatch):
    monkeypatch.setenv("JAX_PLATFORMS", "axon")
    attempts = []

    def run(*a, **k):
        attempts.append(time.monotonic())
        raise subprocess.TimeoutExpired(cmd="jax", timeout=1)

    monkeypatch.setattr(time, "sleep", lambda s: None)  # don't really wait
    monkeypatch.setattr(subprocess, "run", run)
    assert bench._probe_backend(budget_s=1) == "fallback"
    assert len(attempts) >= 1


def test_flap_recovers_on_retry(monkeypatch):
    # relay comes back between attempts: the probe must NOT declare fallback
    monkeypatch.setenv("JAX_PLATFORMS", "axon")
    state = {"n": 0}

    def run(*a, **k):
        state["n"] += 1
        if state["n"] < 3:
            raise subprocess.TimeoutExpired(cmd="jax", timeout=1)
        return _OK("tpu")

    monkeypatch.setattr(time, "sleep", lambda s: None)
    monkeypatch.setattr(subprocess, "run", run)
    assert bench._probe_backend(budget_s=10_000) == "tpu"
    assert state["n"] == 3


def test_init_error_falls_back(monkeypatch):
    monkeypatch.setenv("JAX_PLATFORMS", "axon")

    class Fail:
        returncode = 1

    monkeypatch.setattr(time, "sleep", lambda s: None)
    monkeypatch.setattr(subprocess, "run", lambda *a, **k: Fail())
    assert bench._probe_backend(budget_s=1) == "fallback"


def test_roofline_fields_from_cost_analysis():
    f = bench._roofline_fields(
        bytes_per_step=590e6, flops_per_step=1e9,
        step_time_s=720e-6, device_kind="TPU v5 lite")
    assert f["traffic_model"] == "xla_cost_analysis"
    assert f["hbm_peak_gbps"] == 819.0
    assert 0.95 < f["hbm_roofline_frac"] <= 1.05
    assert f["achieved_gbps"] == round(590e6 / 720e-6 / 1e9, 1)
    assert f["mfu_nominal"] == round(1e9 / 720e-6 / 197e12, 4)


def test_roofline_fields_unknown_chip():
    f = bench._roofline_fields(1e6, 1e6, 1e-3, "SomeFutureChip")
    assert f["achieved_gbps"] is not None
    assert f["hbm_roofline_frac"] is None  # no peak known -> no fake ratio


def test_roofline_fields_no_cost_analysis():
    f = bench._roofline_fields(None, None, 1e-3, "TPU v5 lite")
    assert f["bytes_per_step"] is None and f["traffic_model"] is None
