"""Checkpoint/resume exactness tests."""

import numpy as np

from parallel_nbody_tpu.config import SimConfig
from parallel_nbody_tpu.models.engine import run
from parallel_nbody_tpu.state import init_state
from parallel_nbody_tpu.utils import checkpoint as ckpt
from parallel_nbody_tpu.utils.output import format_state

CFG = SimConfig(force_mode="trig", dtype="float64")


def test_save_load_roundtrip(tmp_path):
    st = run(CFG, init_state(16, CFG), 50)
    path = str(tmp_path / "s.npz")
    ckpt.save_state(path, st, 50)
    loaded, step = ckpt.load_state(path, CFG)
    assert step == 50
    for a, b in zip(st, loaded):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_resume_is_bit_exact(tmp_path):
    full = run(CFG, init_state(16, CFG), 100)
    half = run(CFG, init_state(16, CFG), 40)
    path = str(tmp_path / "h.npz")
    ckpt.save_state(path, half, 40)
    resumed, step = ckpt.load_state(path, CFG)
    out = run(CFG, resumed, 100 - step)
    assert format_state(out) == format_state(full)
