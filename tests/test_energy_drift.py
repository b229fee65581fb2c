"""Long-run energy-drift regression (BASELINE.json config 3; SURVEY.md §4).

The reference never validates physics beyond golden diffs.  Here: the fp32
fast path must track the fp64 trig path closely over a long run, and energy
must stay bounded (friction dissipates; it must never blow up).
"""

import numpy as np
import pytest

from parallel_nbody_tpu.config import SimConfig
from parallel_nbody_tpu.models.engine import run, total_energy
from parallel_nbody_tpu.state import init_state, random_state

F64 = SimConfig(force_mode="trig", dtype="float64")
F32 = SimConfig(force_mode="fast", dtype="float32")


def test_fp32_tracks_fp64_positions():
    n, steps = 256, 500
    st64 = init_state(n, F64)
    st32 = init_state(n, F32)
    out64 = run(F64, st64, steps)
    out32 = run(F32, st32, steps)
    # Position drift after 500 steps stays well under a pixel.
    dx = np.abs(np.asarray(out32.x, np.float64) - np.asarray(out64.x))
    dy = np.abs(np.asarray(out32.y, np.float64) - np.asarray(out64.y))
    assert dx.max() < 0.05, dx.max()
    assert dy.max() < 0.05, dy.max()


@pytest.mark.slow
def test_energy_bounded_long_run_fp32():
    n, steps = 512, 5000
    st = init_state(n, F32)
    e0 = float(total_energy(F32, st))
    out = run(F32, st, steps)
    e1 = float(total_energy(F32, out))
    assert np.isfinite(e1)
    # Friction dissipates; energy must not grow by more than round-off scale.
    assert e1 <= e0 + 0.05 * abs(e0)


def test_no_nans_at_scale_fp32():
    import jax
    st = random_state(4096, F32, jax.random.PRNGKey(7))
    out = run(F32, st, 100)
    for name, arr in zip(out._fields, out):
        assert bool(np.isfinite(np.asarray(arr)).all()), name
