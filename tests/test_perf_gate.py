"""benchmarks/perf_gate.py — the perf regression gate's threshold logic.

The gate's job: a silent throughput regression on the TPU headline config
(N=65536 fused fp32 Pallas) must trip a loud REGRESSION/exit-1, while the
CPU fallback and bench errors behave predictably.  The actual on-hardware
PASS + sabotage-trip records live in benchmarks/perf_gate.json.
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GATE = os.path.join(REPO, "benchmarks", "perf_gate.py")

sys.path.insert(0, os.path.join(REPO, "benchmarks"))
import perf_gate  # noqa: E402


def _headline(value):
    return {"metric": "pairwise interactions/s/chip (N=65536, fused fp32 "
                      "Pallas step)",
            "value": value, "unit": "pairs/s", "vs_baseline": 1.0}


def test_evaluate_pass_at_and_above_floor():
    assert perf_gate.evaluate(_headline(9.5e10))["status"] == "PASS"
    r = perf_gate.evaluate(_headline(1.036e11))
    assert r["status"] == "PASS"
    assert r["headroom"] == pytest.approx(1.036e11 / 9.5e10, rel=1e-3)


def test_evaluate_regression_below_floor():
    r = perf_gate.evaluate(_headline(9.49e10))
    assert r["status"] == "REGRESSION"
    assert r["floor"] == perf_gate.FLOOR_PAIRS_PER_S
    # A 30% silent regression — the VERDICT's scenario — must trip.
    assert perf_gate.evaluate(_headline(0.7 * 1.036e11))["status"] == \
        "REGRESSION"


def test_evaluate_no_floor_for_cpu_fallback_config():
    cpu = {"metric": "pairwise interactions/s/chip (N=4096, fused fp32 "
                     "Pallas step)", "value": 1e8, "unit": "pairs/s",
           "vs_baseline": 0.2}
    assert perf_gate.evaluate(cpu)["status"] == "NO_FLOOR"


def test_evaluate_error_payload():
    assert perf_gate.evaluate({"error": "device backend unresponsive"})[
        "status"] == "ERROR"


def _run_gate(tmp_path, payload, extra=()):
    p = tmp_path / "bench.json"
    p.write_text(json.dumps(payload) + "\n")
    out = tmp_path / "gate.json"
    proc = subprocess.run(
        [sys.executable, GATE, "--json=%s" % p, "--out=%s" % out] +
        list(extra), capture_output=True, text=True, cwd=REPO, timeout=120)
    record = json.loads(out.read_text()) if out.exists() else None
    return proc, record


def test_gate_cli_trips_on_regression(tmp_path):
    proc, record = _run_gate(tmp_path, _headline(5e10))
    assert proc.returncode == 1
    assert "PERF GATE: REGRESSION" in proc.stdout
    assert record["status"] == "REGRESSION"
    assert record["bench"]["value"] == 5e10


def test_gate_cli_passes_at_recorded_rate(tmp_path):
    proc, record = _run_gate(tmp_path, _headline(1.036e11))
    assert proc.returncode == 0
    assert "PERF GATE: PASS" in proc.stdout
    assert record["status"] == "PASS"


def test_gate_cli_floor_override(tmp_path):
    # The override is what the sabotage proof and future re-baselining use.
    proc, _ = _run_gate(tmp_path, _headline(5e10), ["--floor=4e10"])
    assert proc.returncode == 0
    proc, _ = _run_gate(tmp_path, _headline(3e10), ["--floor=4e10"])
    assert proc.returncode == 1


def test_gate_cli_error_payload_fails(tmp_path):
    proc, record = _run_gate(tmp_path, {"error": "boom"})
    assert proc.returncode == 1
    assert "PERF GATE: ERROR" in proc.stdout


def test_load_recorded_accepts_driver_bench_records():
    """The driver's BENCH_r*.json wraps the bench line under 'parsed' —
    the gate must read those directly (so any past round can be re-gated)."""
    payload = perf_gate.load_recorded(os.path.join(REPO, "BENCH_r04.json"))
    r = perf_gate.evaluate(payload)
    assert r["status"] == "PASS"
    assert r["rate"] == pytest.approx(1.036e11, rel=1e-2)


def test_committed_gate_record_is_a_hardware_pass_with_sabotage_trip():
    """The committed benchmarks/perf_gate.json must hold a real-chip PASS at
    the headline config AND a sabotage run that tripped the gate — proof
    the gate detects a deliberate slowdown, not just that it exists."""
    path = os.path.join(REPO, "benchmarks", "perf_gate.json")
    if not os.path.exists(path):
        pytest.skip("hardware gate record not yet generated")
    with open(path) as f:
        rec = json.load(f)
    assert rec["pass"]["status"] == "PASS"
    assert rec["pass"]["rate"] >= rec["pass"]["floor"]
    assert rec["sabotage"]["status"] == "REGRESSION"
    assert rec["sabotage"]["rate"] < rec["sabotage"]["floor"]
    assert rec["sabotage"]["bench_tile"] > 0


@pytest.mark.slow
def test_gate_end_to_end_cpu_is_no_floor(tmp_path):
    """Full path: gate runs bench.py itself; on CPU the fallback config has
    no floor, so the gate reports NO_FLOOR and exits 0."""
    env = dict(os.environ)
    env["NBODY_PLATFORM"] = "cpu"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    out = tmp_path / "gate.json"
    proc = subprocess.run(
        [sys.executable, GATE, "--out=%s" % out],
        capture_output=True, text=True, cwd=REPO, env=env, timeout=900)
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "PERF GATE: NO_FLOOR" in proc.stdout
    assert json.loads(out.read_text())["bench"]["value"] > 0
