"""Golden-output differential tests — the reference's own test strategy
(SURVEY.md §4): byte-exact diff of the final-state printout against the
reference's recorded fixtures.

  - tests/128_MY_REF_OUTPUT : N=128, 1000 steps (sequential oracle)
  - bin/REF_OUTPUT          : N=32, 100000 steps (the instructor's grader)

These run on CPU float64 with force_mode="trig" — the parity configuration.
"""

import os

import pytest

from parallel_nbody_tpu.config import SimConfig
from parallel_nbody_tpu.models.engine import run
from parallel_nbody_tpu.state import init_state
from parallel_nbody_tpu.utils.output import format_state

REF = "/root/reference"

CFG = SimConfig(xdim=1024, ydim=768, force_mode="trig", dtype="float64")


def _golden(path):
    if not os.path.exists(path):
        pytest.skip(f"golden fixture {path} unavailable")
    with open(path) as f:
        return f.read()


def test_parity_n128_1000_steps():
    ref = _golden(os.path.join(REF, "tests/128_MY_REF_OUTPUT"))
    final = run(CFG, init_state(128, CFG), 1000)
    assert format_state(final) == ref


@pytest.mark.slow
def test_parity_n32_100000_steps():
    ref = _golden(os.path.join(REF, "bin/REF_OUTPUT"))
    final = run(CFG, init_state(32, CFG), 100000)
    assert format_state(final) == ref


def test_zero_steps_prints_init():
    # With steps=0 the reference prints the initial state (forces zero).
    final = run(CFG, init_state(4, CFG), 0)
    out = format_state(final)
    assert out.splitlines()[0] == (
        "   313.000      9.000      0.000      0.000      4.575      2.837")
