"""Golden-output differential tests — the reference's own test strategy
(SURVEY.md §4): byte-exact diff of the final-state printout against the
reference's recorded fixtures, vendored into tests/fixtures/ so the suite
never silently skips its core assertion:

  - fixtures/128_MY_REF_OUTPUT : N=128, 1000 steps (sequential oracle,
    reference tests/128_MY_REF_OUTPUT)
  - fixtures/REF_OUTPUT        : N=32, 100000 steps (the instructor's
    grader oracle, reference bin/REF_OUTPUT)

These run on CPU float64 with force_mode="trig" — the parity configuration.
When the reference checkout is mounted, the vendored copies are additionally
verified byte-identical to it.
"""

import os

import pytest

from parallel_nbody_tpu.config import SimConfig
from parallel_nbody_tpu.models.engine import run
from parallel_nbody_tpu.state import init_state
from parallel_nbody_tpu.utils.output import format_state

REF = "/root/reference"
FIXTURES = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "fixtures")

CFG = SimConfig(xdim=1024, ydim=768, force_mode="trig", dtype="float64")


def _golden(name):
    with open(os.path.join(FIXTURES, name)) as f:
        return f.read()


@pytest.mark.parametrize("vendored, upstream", [
    ("128_MY_REF_OUTPUT", "tests/128_MY_REF_OUTPUT"),
    ("REF_OUTPUT", "bin/REF_OUTPUT"),
])
def test_vendored_fixture_matches_reference(vendored, upstream):
    path = os.path.join(REF, upstream)
    if not os.path.exists(path):
        pytest.skip("reference checkout unavailable")
    assert _golden(vendored) == open(path).read()


def test_parity_n128_1000_steps():
    final = run(CFG, init_state(128, CFG), 1000)
    assert format_state(final) == _golden("128_MY_REF_OUTPUT")


@pytest.mark.parametrize("n, steps", [
    (2, 1000),     # the bodyCt lower clamp — minimal system
    (64, 500),
    (256, 300),
    (1000, 100),
])
def test_parity_fresh_reference_captures(n, steps):
    """Golden outputs captured from the reference's own compiled nbody-seq
    binary (/root/reference/nbody/nbody-seq N 0 arena.ppm STEPS) at configs
    beyond the repo's shipped fixtures — broader differential evidence."""
    final = run(CFG, init_state(n, CFG), steps)
    assert format_state(final) == _golden("seq_%d_%d.out" % (n, steps))


@pytest.mark.slow
def test_parity_n32_100000_steps():
    final = run(CFG, init_state(32, CFG), 100000)
    assert format_state(final) == _golden("REF_OUTPUT")


def test_zero_steps_prints_init():
    # With steps=0 the reference prints the initial state (forces zero).
    final = run(CFG, init_state(4, CFG), 0)
    out = format_state(final)
    assert out.splitlines()[0] == (
        "   313.000      9.000      0.000      0.000      4.575      2.837")


@pytest.mark.slow
def test_parity_n4096_largest_exact():
    final = run(CFG, init_state(4096, CFG), 100)
    assert format_state(final) == _golden("seq_4096_100.out")


@pytest.mark.slow
def test_parity_n10000_maxbodies_boundary_pinned():
    """N=10000 (MAXBODIES) x 100 steps — the reference's whole domain,
    pinned against a vendored reference-binary capture (VERDICT r2 #4).

    Round 2 measured 1 of 60,000 fields off by one print ulp here (tree-
    reduction summation order); round 3 replaced the dense trig reduction
    with a lax.scan that replicates the C loop's left-to-right accumulation
    order bit-for-bit (ops/forces.py::_sequential_row_sum), closing the
    boundary.  This regression test keeps the whole reference domain
    byte-exact."""
    final = run(CFG, init_state(10000, CFG), 100)
    assert format_state(final) == _golden("seq_10000_100.out")


@pytest.mark.slow
def test_parity_n2048():
    final = run(CFG, init_state(2048, CFG), 100)
    assert format_state(final) == _golden("seq_2048_100.out")
