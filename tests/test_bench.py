"""bench.py contract tests.

The driver records bench.py's single JSON line as the round's benchmark
artifact; a wedged device transport used to hang it forever (recording
nothing).  These tests pin the probe-and-retry behavior and the output
contract.
"""

import json
import os
import subprocess
import sys

import pytest

import bench

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_probe_responsive_cpu(monkeypatch):
    # The child honors NBODY_PLATFORM via jax.config (the env var alone is
    # ignored by ambient platform plugins) — forced here so the probe never
    # touches a real device tunnel from the test suite.
    monkeypatch.setenv("NBODY_PLATFORM", "cpu")
    assert bench._backend_responsive(timeout_s=120.0) == ("cpu", None)


def test_probe_timeout_returns_none():
    # A timeout far below interpreter startup forces the TimeoutExpired
    # branch — the wedged-transport path, without needing a wedged transport.
    assert bench._backend_responsive(timeout_s=0.05) == (None, "timeout")


def test_probe_crash_carries_stderr(monkeypatch):
    # A bogus platform makes the child exit nonzero in seconds — the probe
    # must report a crash (with a stderr tail), not a wedge.
    monkeypatch.setenv("NBODY_PLATFORM", "notaplatform")
    backend, why = bench._backend_responsive(timeout_s=120.0)
    assert backend is None
    assert why.startswith("crash: ") and why != "crash: no stderr"


def test_main_emits_error_json_when_backend_never_responds(monkeypatch, capsys):
    calls = []

    def fake_probe(*a, **k):
        calls.append(1)
        return None, "timeout"

    monkeypatch.setattr(bench, "_backend_responsive", fake_probe)
    monkeypatch.setattr(bench, "_PROBE_ATTEMPTS", 3)
    monkeypatch.setattr(bench, "_PROBE_RETRY_SLEEP_S", 0.0)
    rc = bench.main()
    assert rc == 1
    assert len(calls) == 3
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 1
    payload = json.loads(out[0])
    assert "unresponsive" in payload["error"]
    assert "3 probes" in payload["error"]
    assert "wedged" in payload["error"]


def test_main_short_circuits_on_deterministic_crash(monkeypatch, capsys):
    # A crashing probe is deterministic: one quick retry, then the error
    # JSON — never the full multi-minute wedge budget.
    calls = []

    def fake_probe(*a, **k):
        calls.append(1)
        return None, "crash: ModuleNotFoundError: no module named 'jax'"

    monkeypatch.setattr(bench, "_backend_responsive", fake_probe)
    monkeypatch.setattr(bench, "_CRASH_RETRY_SLEEP_S", 0.0)
    rc = bench.main()
    assert rc == 1
    assert len(calls) == bench._CRASH_ATTEMPTS
    payload = json.loads(capsys.readouterr().out.strip())
    assert "ModuleNotFoundError" in payload["error"]


@pytest.mark.slow
def test_bench_end_to_end_cpu_fallback(tmp_path):
    """bench.py on the CPU fallback config prints exactly one valid JSON
    line with the contract keys (metric/value/unit/vs_baseline)."""
    env = {"NBODY_PLATFORM": "cpu", "PATH": "/usr/bin:/bin"}
    for k in ("PYTHONPATH", "HOME", "XLA_FLAGS"):
        if os.environ.get(k):
            env[k] = os.environ[k]
    proc = subprocess.run(
        [sys.executable, "bench.py"], cwd=REPO, env=env,
        capture_output=True, text=True, timeout=900)
    assert proc.returncode == 0, proc.stderr[-2000:]
    lines = [l for l in proc.stdout.strip().splitlines() if l.strip()]
    assert len(lines) == 1, proc.stdout
    payload = json.loads(lines[0])
    assert set(payload) == {"metric", "value", "unit", "vs_baseline"}
    assert payload["value"] > 0
    assert payload["unit"] == "pairs/s"
