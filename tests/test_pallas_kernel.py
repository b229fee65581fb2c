"""Pallas force-kernel tests (interpret mode on CPU; the real-TPU validation
runs in benchmarks and on hardware)."""

import jax
import numpy as np
import pytest

from parallel_nbody_tpu.config import SimConfig
from parallel_nbody_tpu.ops.forces import compute_forces_dense
from parallel_nbody_tpu.ops.pallas_step import pallas_forces
from parallel_nbody_tpu.state import pad_state, random_state

CFG = SimConfig(force_mode="fast", dtype="float32")


def _forces(st, **kw):
    return pallas_forces(CFG, st.x, st.y, st.mass, st.radius,
                         interpret=True, **kw)


def test_matches_dense_fast_path():
    st = random_state(512, CFG, jax.random.PRNGKey(0))
    xf, yf = _forces(st, tile_i=128, tile_j=256)
    xf_d, yf_d = compute_forces_dense(CFG, st.x, st.y, st.mass, st.radius)
    np.testing.assert_allclose(np.asarray(xf), np.asarray(xf_d),
                               rtol=2e-3, atol=1e-2)
    np.testing.assert_allclose(np.asarray(yf), np.asarray(yf_d),
                               rtol=2e-3, atol=1e-2)


def test_padding_bodies_get_and_exert_zero_force():
    st = random_state(100, CFG, jax.random.PRNGKey(1))
    padded, n = pad_state(st, 128)
    xf, yf = _forces(padded, tile_i=64, tile_j=128)
    assert np.isfinite(np.asarray(xf)).all()
    np.testing.assert_array_equal(np.asarray(xf)[n:], 0.0)
    np.testing.assert_array_equal(np.asarray(yf)[n:], 0.0)
    # Real bodies unaffected by padding: compare against unpadded dense.
    xf_d, _ = compute_forces_dense(CFG, st.x, st.y, st.mass, st.radius)
    np.testing.assert_allclose(np.asarray(xf)[:n], np.asarray(xf_d),
                               rtol=2e-3, atol=1e-2)


def test_awkward_sizes_fall_back_to_divisor_tiles():
    # 96 is not divisible by 64; the kernel falls back to gcd tiles (32) and
    # must still be correct.
    st = random_state(96, CFG, jax.random.PRNGKey(2))
    xf, yf = _forces(st, tile_i=64, tile_j=64)
    xf_d, yf_d = compute_forces_dense(CFG, st.x, st.y, st.mass, st.radius)
    np.testing.assert_allclose(np.asarray(xf), np.asarray(xf_d),
                               rtol=2e-3, atol=1e-2)


def test_momentum_conservation():
    st = random_state(256, CFG, jax.random.PRNGKey(3))
    xf, yf = _forces(st, tile_i=128, tile_j=128)
    # One-sided evaluation still conserves total momentum to fp32 round-off.
    total = abs(float(np.sum(np.asarray(xf, np.float64))))
    scale = float(np.abs(np.asarray(xf)).max())
    assert total < 1e-3 * scale
