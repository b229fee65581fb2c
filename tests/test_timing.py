"""Timing/instrumentation utilities."""

import glob
import os

from parallel_nbody_tpu.config import SimConfig
from parallel_nbody_tpu.models.engine import run
from parallel_nbody_tpu.state import init_state
from parallel_nbody_tpu.utils.timing import StepTimer, trace


def test_step_timer_accounting():
    import pytest

    with StepTimer(128, 10) as t:
        pass
    assert t.rtime >= 0
    # 10 steps of N=128: flop model fixed by the reference (nbody-seq.c:367).
    assert t.gflops * t.rtime * 1e9 == pytest.approx(
        10 * (20 * (128 * 127 // 2) + 18 * 128 + 4 * 128))


def test_profiler_trace_writes_events(tmp_path):
    log_dir = str(tmp_path / "trace")
    cfg = SimConfig()
    st = init_state(16, cfg)
    with trace(log_dir):
        out = run(cfg, st, 5)
        out.x.block_until_ready()
    files = glob.glob(os.path.join(log_dir, "**", "*"), recursive=True)
    assert any(os.path.isfile(f) for f in files), files
