"""Debug-mode / validation utilities tests."""

import jax.numpy as jnp
import numpy as np

from parallel_nbody_tpu.config import SimConfig
from parallel_nbody_tpu.state import State, init_state
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
