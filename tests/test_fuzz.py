"""bin/fuzz-parity.sh — randomized differential parity against the
reference binary (the automated version of a fresh-oracle probe).

The script's oracle is the compiled reference program itself
(/root/reference/nbody/nbody-seq), so unlike bin/tests.sh (whose oracle is
our own --devices=1 run) a pass here is end-to-end external evidence.
"""

import os
import subprocess

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFBIN = "/root/reference/nbody/nbody-seq"


def _run_fuzz(count, seed):
    return subprocess.run(
        ["bash", os.path.join(REPO, "bin", "fuzz-parity.sh"),
         str(count), str(seed)],
        capture_output=True, text=True, timeout=900, cwd=REPO)


def test_fuzz_parity_two_random_configs():
    if not os.access(REFBIN, os.X_OK):
        pytest.skip("reference checkout unavailable")
    proc = _run_fuzz(2, 918273)
    assert proc.returncode == 0, proc.stdout + proc.stderr
    lines = [l for l in proc.stdout.splitlines() if l.startswith("PASSED")]
    assert len(lines) == 2, proc.stdout + proc.stderr


def test_fuzz_skips_cleanly_without_reference(tmp_path):
    env = dict(os.environ)
    env["NBODY_REF_BIN"] = str(tmp_path / "missing-binary")
    proc = subprocess.run(
        ["bash", os.path.join(REPO, "bin", "fuzz-parity.sh"), "1", "1"],
        capture_output=True, text=True, timeout=120, cwd=REPO, env=env)
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "SKIPPED" in proc.stdout
