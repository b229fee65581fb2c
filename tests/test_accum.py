"""Compensated (Kahan) accumulation option — SimConfig.accum (BASELINE
config 3's "fp64-emulated accumulation"; VERDICT r3 #2).

The kernels' partial-sum folds (per column tile, and across HBM bands in the
streamed kernel) are the compensation sites; within-tile jnp.sum reductions
are unchanged.  benchmarks/drift_study.py measures accuracy/cost on real
hardware; these tests pin the semantics in interpret mode.
"""

import numpy as np

import jax.numpy as jnp

from parallel_nbody_tpu.config import SimConfig
from parallel_nbody_tpu.models.engine import run
from parallel_nbody_tpu.ops.pallas_step import (pallas_block_forces,
                                                pallas_block_forces_streamed)
from parallel_nbody_tpu.state import init_state

CFG32 = SimConfig(force_mode="fast", dtype="float32", kernel="pallas",
                  pallas_interpret=True)


def _magnitude_spread_case():
    """One row body vs 4096 column bodies at unit distance along +x, so each
    column body j contributes exactly m_j to the raw x accumulation.  Column
    body 0 carries mass 2**24; the rest carry 0.9/128 each, so every later
    column TILE's partial sum (0.9) is below half an ulp of the running
    2**24 accumulator — plain fp32 accumulation drops ~28.8 of true force,
    Kahan compensation recovers it."""
    n_cols = 4096
    xi = jnp.zeros((1,), jnp.float32)
    yi = jnp.zeros((1,), jnp.float32)
    mi = jnp.ones((1,), jnp.float32)
    ri = jnp.full((1,), 0.1, jnp.float32)
    xj = jnp.ones((n_cols,), jnp.float32)
    yj = jnp.zeros((n_cols,), jnp.float32)
    mj = jnp.full((n_cols,), 0.9 / 128, jnp.float32).at[0].set(2.0**24)
    rj = jnp.full((n_cols,), 0.1, jnp.float32)
    exact = 1.1 * (2.0**24 + (n_cols - 1) * (0.9 / 128))  # G * m_i * sum m_j
    return (xi, yi, mi, ri, xj, yj, mj, rj), exact


def test_compensated_recovers_small_contributions_resident():
    args, exact = _magnitude_spread_case()
    xi, yi, mi, ri, xj, yj, mj, rj = args

    def err(accum):
        fx, _ = pallas_block_forces(
            CFG32, xi, yi, mi, ri, xj, yj, mj, rj,
            row_g0=0, col_g0=8192,  # disjoint ids: no overlap segment
            tile_i=128, tile_j=128, interpret=True, biased=False,
            accum=accum)
        return abs(float(fx[0]) - exact) / exact

    e_plain = err("plain")
    e_comp = err("compensated")
    # True dropped mass is ~28.8/2**24 = 1.7e-6 relative; compensation
    # recovers all but the (uncompensated) within-tile rounding ~5e-8.
    assert e_plain > 5e-7, e_plain
    assert e_comp < 3e-7, e_comp
    assert e_comp < e_plain / 3


def test_compensated_recovers_small_contributions_streamed():
    """Same case through the HBM-streamed kernel with band=128 (32 bands of
    one tile each): every cross-band fold is a 0.9-sized add below the
    accumulator's ulp, so the scratch-based cross-band compensation is what
    recovers it."""
    args, exact = _magnitude_spread_case()
    xi, yi, mi, ri, xj, yj, mj, rj = args

    def err(accum):
        fx, _ = pallas_block_forces_streamed(
            CFG32, xi, yi, mi, ri, xj, yj, mj, rj,
            row_g0=0, col_g0=8192,
            tile_i=128, tile_j=128, band=128, interpret=True, biased=False,
            accum=accum)
        return abs(float(fx[0]) - exact) / exact

    e_plain = err("plain")
    e_comp = err("compensated")
    assert e_plain > 5e-7, e_plain
    assert e_comp < 3e-7, e_comp


def test_compensated_matches_plain_on_normal_state():
    """On a glibc init (no pathological magnitude spread) compensated and
    plain agree to fp32 roundoff — compensation changes rounding, never
    semantics.  Runs the FULL engine step so the cfg plumbing (biased
    dispatch included) is covered."""
    cfg_p = CFG32
    cfg_c = CFG32.replace(accum="compensated")
    st = init_state(512, cfg_p)
    out_p = run(cfg_p, st, 3)
    out_c = run(cfg_c, st, 3)
    for f in ("x", "y", "xv", "yv", "xf", "yf"):
        a = np.asarray(getattr(out_p, f), np.float64)
        b = np.asarray(getattr(out_c, f), np.float64)
        np.testing.assert_allclose(b, a, rtol=1e-5, atol=1e-4,
                                   err_msg="field " + f)


def test_compensated_streamed_matches_resident():
    """Streamed (multi-band, scratch-compensated) vs resident compensated on
    the same block: same math, band decomposition must not change results
    beyond roundoff."""
    cfg = CFG32
    st = init_state(1024, cfg)
    fr = pallas_block_forces(cfg, st.x, st.y, st.mass, st.radius,
                             st.x, st.y, st.mass, st.radius,
                             tile_i=256, tile_j=256, interpret=True,
                             accum="compensated")
    fs = pallas_block_forces_streamed(cfg, st.x, st.y, st.mass, st.radius,
                                      st.x, st.y, st.mass, st.radius,
                                      tile_i=256, tile_j=256, band=256,
                                      interpret=True, accum="compensated")
    for a, b in zip(fr, fs):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-5, atol=1e-3)


def test_accum_option_reaches_kernel_through_engine(monkeypatch):
    """cfg.accum must actually arrive at the Pallas kernel through
    engine.step's dispatch.  The agreement test above cannot catch a
    dropped kwarg (plain==compensated on normal states), so assert the
    plumbing positively with a spy."""
    from parallel_nbody_tpu.models import engine
    from parallel_nbody_tpu.ops import pallas_step

    seen = []
    orig = pallas_step.pallas_forces

    def spy(cfg, *a, **kw):
        seen.append(kw.get("accum", "MISSING"))
        return orig(cfg, *a, **kw)

    # engine.step imports the symbol lazily from ops.pallas_step, so patch
    # the source module.
    monkeypatch.setattr(pallas_step, "pallas_forces", spy)
    cfg = CFG32.replace(accum="compensated")
    engine.step(cfg, init_state(128, cfg))
    assert set(seen) == {"compensated"}, seen
