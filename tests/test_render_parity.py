"""bin/render-parity.sh — our rendered PPM byte-diffed against the frames
the REFERENCE BINARY itself writes (nbody-seq.c:327-355,466-471).

Every other golden diff in the suite covers the printed body table; this is
the external parity check for the render surface (rasterizer + tint + the
native mmap blit).  Deterministic because at N=10000 each step takes whole
seconds on both engines, so with secs_per_update=1 every step triggers a
frame and display() full-frame-overwrites — the final PPM is exactly the
render of the last state.
"""

import os
import subprocess

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFBIN = "/root/reference/nbody/nbody-seq"


def _run(args, out_dir, timeout):
    env = dict(os.environ)
    env["NBODY_RENDER_OUT"] = str(out_dir)
    return subprocess.run(
        ["bash", os.path.join(REPO, "bin", "render-parity.sh")] + args,
        capture_output=True, text=True, timeout=timeout, cwd=REPO, env=env)


@pytest.mark.slow
@pytest.mark.parametrize("flags", [[], ["--devices=2"]])
def test_render_parity_vs_reference_binary(tmp_path, flags):
    if not os.access(REFBIN, os.X_OK):
        pytest.skip("reference checkout unavailable")
    # 2 steps keeps the N=10000 fp64 trig engine run under a minute while
    # still exercising a moving-body re-render over the first frame; the
    # sharded case renders from gathered shard state.
    proc = _run(["2"] + flags, tmp_path, timeout=1200)
    assert proc.returncode == 0, proc.stdout + proc.stderr
    if "SKIPPED: cadence premise unmet" in proc.stdout:
        # A box fast enough to step N=10000 in under ~2 s/step breaks the
        # deterministic-frame premise; the comparison is inconclusive there.
        pytest.skip(proc.stdout.strip().splitlines()[-1])
    assert "PASSED ppm" in proc.stdout, proc.stdout + proc.stderr
    assert "PASSED stdout" in proc.stdout, proc.stdout + proc.stderr


def test_render_parity_skips_cleanly_without_reference(tmp_path):
    env = dict(os.environ)
    env["NBODY_REF_BIN"] = str(tmp_path / "missing-binary")
    env["NBODY_RENDER_OUT"] = str(tmp_path / "out")
    proc = subprocess.run(
        ["bash", os.path.join(REPO, "bin", "render-parity.sh")],
        capture_output=True, text=True, timeout=120, cwd=REPO, env=env)
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "SKIPPED" in proc.stdout
