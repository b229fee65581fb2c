"""Kernel unit tests vs a NumPy oracle — the layer the reference lacks
(SURVEY.md §4 implication (c)).

The oracle transliterates the reference's per-pair math
(nbody-seq.c:79-165) as plain Python loops over float64.
"""

import numpy as np
import pytest

from parallel_nbody_tpu.config import SimConfig
from parallel_nbody_tpu.models.engine import step, total_energy
from parallel_nbody_tpu.ops.forces import compute_forces_dense
from parallel_nbody_tpu.ops.integrate import (compute_positions,
                                              compute_velocities)
from parallel_nbody_tpu.state import init_state

CFG = SimConfig(xdim=1024, ydim=768, force_mode="trig", dtype="float64")


def numpy_forces(cfg, x, y, mass, radius):
    n = len(x)
    xf = np.zeros(n)
    yf = np.zeros(n)
    for b in range(n):
        for c in range(b + 1, n):
            dx = x[c] - x[b]
            dy = y[c] - y[b]
            angle = np.arctan2(dy, dx)
            dsqr = dx * dx + dy * dy
            mind = radius[b] + radius[c]
            forced = max(dsqr, mind * mind)
            force = mass[b] * mass[c] * cfg.gravity / forced
            fx = force * np.cos(angle)
            fy = force * np.sin(angle)
            xf[b] += fx
            yf[b] += fy
            xf[c] -= fx
            yf[c] -= fy
    return xf, yf


def numpy_step(cfg, x, y, xv, yv, mass, radius):
    xf, yf = numpy_forces(cfg, x, y, mass, radius)
    for b in range(len(x)):
        speed = np.sqrt(xv[b] ** 2 + yv[b] ** 2) * cfg.friction
        angle = np.arctan2(yv[b], xv[b])
        fx = xf[b] - speed * np.cos(angle)
        fy = yf[b] - speed * np.sin(angle)
        xv[b] += (fx / mass[b]) * cfg.dt
        yv[b] += (fy / mass[b]) * cfg.dt
    for b in range(len(x)):
        xn = x[b] + xv[b] * cfg.dt
        yn = y[b] + yv[b] * cfg.dt
        if xn < 0:
            xn = 0.0
            xv[b] = -xv[b]
        elif xn >= cfg.xdim:
            xn = cfg.xdim - 1.0
            xv[b] = -xv[b]
        if yn < 0:
            yn = 0.0
            yv[b] = -yv[b]
        elif yn >= cfg.ydim:
            yn = cfg.ydim - 1.0
            yv[b] = -yv[b]
        x[b] = xn
        y[b] = yn
    return x, y, xv, yv, xf, yf


def _np_state(st):
    return [np.asarray(a, np.float64).copy() for a in st]


def test_forces_match_numpy_oracle():
    st = init_state(33, CFG)
    x, y, xv, yv, xf0, yf0, mass, radius = _np_state(st)
    exf, eyf = numpy_forces(CFG, x, y, mass, radius)
    xf, yf = compute_forces_dense(CFG, st.x, st.y, st.mass, st.radius)
    np.testing.assert_allclose(np.asarray(xf), exf, rtol=1e-12, atol=1e-9)
    np.testing.assert_allclose(np.asarray(yf), eyf, rtol=1e-12, atol=1e-9)


def test_full_step_matches_numpy_oracle():
    st = init_state(17, CFG)
    x, y, xv, yv, _, _, mass, radius = _np_state(st)
    ex, ey, exv, eyv, exf, eyf = numpy_step(CFG, x, y, xv, yv, mass, radius)
    out = step(CFG, st)
    np.testing.assert_allclose(np.asarray(out.x), ex, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(out.y), ey, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(out.xv), exv, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(out.yv), eyv, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(out.xf), exf, rtol=1e-12, atol=1e-9)
    np.testing.assert_allclose(np.asarray(out.yf), eyf, rtol=1e-12, atol=1e-9)


def test_fast_mode_agrees_with_trig_mode():
    # The algebraic decomposition is mathematically identical; allow fp
    # round-off differences only.
    fast = CFG.replace(force_mode="fast")
    st = init_state(64, CFG)
    xf_t, yf_t = compute_forces_dense(CFG, st.x, st.y, st.mass, st.radius)
    xf_f, yf_f = compute_forces_dense(fast, st.x, st.y, st.mass, st.radius)
    np.testing.assert_allclose(np.asarray(xf_f), np.asarray(xf_t),
                               rtol=1e-9, atol=1e-6)
    np.testing.assert_allclose(np.asarray(yf_f), np.asarray(yf_t),
                               rtol=1e-9, atol=1e-6)


def test_newton_third_law():
    # Total momentum change from gravity alone is zero (forces cancel).
    st = init_state(50, CFG)
    xf, yf = compute_forces_dense(CFG, st.x, st.y, st.mass, st.radius)
    assert abs(float(np.sum(np.asarray(xf)))) < 1e-6
    assert abs(float(np.sum(np.asarray(yf)))) < 1e-6


def test_wall_bounce_semantics():
    import jax.numpy as jnp
    cfg = CFG
    # Body heading past the right wall and one heading past the bottom.
    x = jnp.array([1023.9999, 5.0])
    y = jnp.array([5.0, 0.0000001])
    xv = jnp.array([1e3, 0.0])
    yv = jnp.array([0.0, -1e3])
    xn, yn, xvn, yvn = compute_positions(cfg, x, y, xv, yv)
    assert float(xn[0]) == cfg.xdim - 1 and float(xvn[0]) == -1e3
    assert float(yn[1]) == 0.0 and float(yvn[1]) == 1e3


def test_friction_slows_free_body():
    cfg = CFG
    xv = np.array([3.0])
    yv = np.array([4.0])
    xvn, yvn = compute_velocities(cfg, xv, yv, np.zeros(1), np.zeros(1),
                                  np.ones(1))
    assert abs(float(xvn[0])) < 3.0
    assert abs(float(yvn[0])) < 4.0


def test_energy_dissipates_with_friction():
    st = init_state(32, CFG)
    e0 = float(total_energy(CFG, st))
    from parallel_nbody_tpu.models.engine import run
    e1 = float(total_energy(CFG, run(CFG, st, 500)))
    # Friction removes kinetic energy; drift should be small and negative-ish.
    assert np.isfinite(e0) and np.isfinite(e1)
    assert abs(e1 - e0) / abs(e0) < 0.05


def test_pallas_trig_config_rejected():
    with pytest.raises(ValueError, match="pallas"):
        SimConfig(kernel="pallas", force_mode="trig")


def test_run_trajectory_records_frames():
    import numpy as np
    from parallel_nbody_tpu.config import SimConfig
    from parallel_nbody_tpu.models.engine import run, run_trajectory
    from parallel_nbody_tpu.state import init_state

    cfg = SimConfig()
    st = init_state(8, cfg)
    final, xs, ys = run_trajectory(cfg, st, 20, record_every=5)
    assert xs.shape == (4, 8) and ys.shape == (4, 8)
    # Last recorded frame is the final state; trajectory matches plain run.
    np.testing.assert_array_equal(np.asarray(xs[-1]), np.asarray(final.x))
    ref = run(cfg, st, 20)
    np.testing.assert_array_equal(np.asarray(final.x), np.asarray(ref.x))
