"""Debug-mode / validation utilities tests."""

import jax.numpy as jnp
import numpy as np

from parallel_nbody_tpu.config import SimConfig
from parallel_nbody_tpu.state import init_state
from parallel_nbody_tpu.utils.debug import validate_state


def test_validate_clean_state():
    cfg = SimConfig(dtype="float64")
    st = init_state(8, cfg)
    d = validate_state(st, cfg.xdim, cfg.ydim)
    assert d.ok() and d.pos_in_bounds and d.n == 8


def test_validate_detects_nans():
    cfg = SimConfig(dtype="float64")
    st = init_state(8, cfg)
    bad = st._replace(xv=st.xv.at[3].set(jnp.nan))
    d = validate_state(bad, cfg.xdim, cfg.ydim)
    assert not d.ok()
    assert d.nan_fields == ["xv"]


def test_validate_detects_out_of_bounds():
    cfg = SimConfig(dtype="float64")
    st = init_state(8, cfg)
    bad = st._replace(x=st.x.at[0].set(99999.0))
    d = validate_state(bad, cfg.xdim, cfg.ydim)
    assert d.finite and not d.pos_in_bounds


def test_validate_bounds_are_half_open():
    # Legal positions occupy [0, dim): the wall bounce (compute_positions)
    # only clamps once x_new >= dim, so xdim - 0.5 is a healthy state and
    # must not be reported out of bounds; xdim itself must be.
    cfg = SimConfig(dtype="float64")
    st = init_state(8, cfg)
    ok = st._replace(x=st.x.at[0].set(cfg.xdim - 0.5))
    assert validate_state(ok, cfg.xdim, cfg.ydim).pos_in_bounds
    bad = st._replace(x=st.x.at[0].set(float(cfg.xdim)))
    assert not validate_state(bad, cfg.xdim, cfg.ydim).pos_in_bounds


def test_per_field_printers():
    from parallel_nbody_tpu.utils.debug import (format_forces,
                                                format_positions,
                                                format_velocities)
    from parallel_nbody_tpu.utils.output import format_state

    st = init_state(4, SimConfig())
    pos = format_positions(st)
    vel = format_velocities(st)
    frc = format_forces(st)
    assert len(pos.splitlines()) == 4
    # Column pairs must agree with the 6-column full printout.
    full = [l.split() for l in format_state(st).splitlines()]
    assert [l.split() for l in pos.splitlines()] == [f[0:2] for f in full]
    assert [l.split() for l in frc.splitlines()] == [f[2:4] for f in full]
    assert [l.split() for l in vel.splitlines()] == [f[4:6] for f in full]
