"""bench.py contract tests.

The driver records bench.py's single JSON line as the round's benchmark
artifact; a wedged device transport used to hang it forever (recording
nothing).  These tests pin the probe-and-retry behavior and the output
contract.
"""

import json
import subprocess
import sys

import pytest

import bench


def test_probe_responsive_cpu(monkeypatch):
    # The child honors NBODY_PLATFORM via jax.config (the env var alone is
    # ignored by ambient platform plugins) — forced here so the probe never
    # touches a real device tunnel from the test suite.
    monkeypatch.setenv("NBODY_PLATFORM", "cpu")
    assert bench._backend_responsive(timeout_s=120.0) == "cpu"


def test_probe_timeout_returns_none():
    # A timeout far below interpreter startup forces the TimeoutExpired
    # branch — the wedged-transport path, without needing a wedged transport.
    assert bench._backend_responsive(timeout_s=0.05) is None


def test_main_emits_error_json_when_backend_never_responds(monkeypatch, capsys):
    monkeypatch.setattr(bench, "_backend_responsive", lambda *a, **k: None)
    monkeypatch.setattr(bench, "_PROBE_ATTEMPTS", 3)
    monkeypatch.setattr(bench, "_PROBE_RETRY_SLEEP_S", 0.0)
    rc = bench.main()
    assert rc == 1
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 1
    payload = json.loads(out[0])
    assert "unresponsive" in payload["error"]
    assert "3 probes" in payload["error"]


@pytest.mark.slow
def test_bench_end_to_end_cpu_fallback(tmp_path):
    """bench.py on the CPU fallback config prints exactly one valid JSON
    line with the contract keys (metric/value/unit/vs_baseline)."""
    env = {"NBODY_PLATFORM": "cpu", "PATH": "/usr/bin:/bin"}
    import os
    for k in ("PYTHONPATH", "HOME", "XLA_FLAGS"):
        if os.environ.get(k):
            env[k] = os.environ[k]
    proc = subprocess.run(
        [sys.executable, "bench.py"], cwd="/root/repo", env=env,
        capture_output=True, text=True, timeout=900)
    assert proc.returncode == 0, proc.stderr[-2000:]
    lines = [l for l in proc.stdout.strip().splitlines() if l.strip()]
    assert len(lines) == 1, proc.stdout
    payload = json.loads(lines[0])
    assert set(payload) == {"metric", "value", "unit", "vs_baseline"}
    assert payload["value"] > 0
    assert payload["unit"] == "pairs/s"
