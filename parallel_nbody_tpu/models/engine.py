"""Single-device simulation engine.

The reference's hot loop (nbody-seq.c:457-472) is
``clear_forces -> compute_forces -> compute_velocities -> compute_positions``
with a buffer flip.  Here the whole loop runs on-device under one ``jit`` via
``lax.scan`` / ``lax.fori_loop`` (no host round-trips between steps); the
functional state update replaces the flip.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

from ..config import SimConfig
from ..ops.forces import compute_forces_dense
from ..ops.integrate import compute_positions, compute_velocities
from ..state import State


def step(cfg: SimConfig, state: State) -> State:
    """One simulation step (force -> velocity -> position)."""
    if cfg.kernel == "pallas":
        from ..ops.pallas_step import (forces_coincident_dispatch,
                                       pallas_forces)

        # Coincident-pair dispatch: the dx-bias machinery that reproduces
        # the reference's atan2(0,0) kick (nbody-seq.c:91-106) costs ~2 VPU
        # ops in the O(N^2) inner loop (~3% of step time, measured).  An
        # exact O(N log N) duplicate-position test selects the biased kernel
        # only on steps that actually contain coincident distinct bodies —
        # the first step(s) of a glibc integer-pixel init — so every other
        # step runs at full speed with identical results.
        xf, yf = forces_coincident_dispatch(
            state.x, state.y, state.mass,
            lambda biased: pallas_forces(
                cfg, state.x, state.y, state.mass, state.radius,
                tile_i=cfg.tile_i, tile_j=cfg.tile_j,
                interpret=cfg.pallas_interpret, biased=biased,
                accum=cfg.accum))
    else:
        xf, yf = compute_forces_dense(cfg, state.x, state.y, state.mass,
                                      state.radius)
    xv, yv = compute_velocities(cfg, state.xv, state.yv, xf, yf, state.mass)
    x, y, xv, yv = compute_positions(cfg, state.x, state.y, xv, yv,
                                     mass=state.mass)
    return State(x, y, xv, yv, xf, yf, state.mass, state.radius)


@functools.partial(jax.jit, static_argnums=(0, 2))
def run(cfg: SimConfig, state: State, steps: int) -> State:
    """Run ``steps`` simulation steps fully on device."""

    def body(_, s):
        return step(cfg, s)

    return lax.fori_loop(0, steps, body, state)


@functools.partial(jax.jit, static_argnums=(0, 2, 3))
def run_trajectory(cfg: SimConfig, state: State, steps: int,
                   record_every: int = 1):
    """Run ``steps`` steps, recording (x, y) every ``record_every`` steps.

    Returns (final_state, xs, ys) where xs/ys have shape
    (steps // record_every, N).  Used for animation / analysis.
    """

    def body(s, _):
        def inner(_, s2):
            return step(cfg, s2)

        s = lax.fori_loop(0, record_every, inner, s)
        return s, (s.x, s.y)

    final, (xs, ys) = lax.scan(body, state, None, length=steps // record_every)
    return final, xs, ys


def make_hosted_row_step(cfg: SimConfig, n: int, row_chunk: int = 524288):
    """Host-driven row-chunked stepping for HUGE single-chip N (CLI support
    for the N=10M scale demo, VERDICT r3 #4).

    One fused on-device step at N=10M is ~490 s of device work (docs/
    REPORT.md) — a single dispatch that long exceeds transports that bound
    per-dispatch duration (~60 s here).  This builds the same step as
    ``step`` but dispatches the force pass in row chunks (rows x ALL columns
    through the HBM-streamed kernel, ~25 s each at the default chunk), then
    integrates; everything stays on-device between dispatches.  The exact
    coincident-pair test runs once per step on the host (positions are fixed
    for the whole force pass) and selects the biased/unbiased kernel
    statically for every chunk — the host-driven analog of
    ``forces_coincident_dispatch``.

    Returns (step_fn, warmup): ``step_fn(state, fence=None) -> state`` with
    ``fence(arr)`` called after each dispatch; ``warmup()`` AOT-compiles
    every program variant (both kernel biases, the tail chunk, integration)
    so no compile lands inside a timed region.
    """
    from ..ops.pallas_step import any_coincident, pallas_block_forces_streamed

    row_chunk = min(row_chunk, n)
    chunk_sizes = sorted({row_chunk, n % row_chunk or row_chunk})
    dtype = jnp.dtype(cfg.dtype)

    @functools.partial(jax.jit, static_argnames=("k", "biased"))
    def force_rows(x, y, m, r, r0, k, biased):
        xi = lax.dynamic_slice_in_dim(x, r0, k)
        yi = lax.dynamic_slice_in_dim(y, r0, k)
        mi = lax.dynamic_slice_in_dim(m, r0, k)
        ri = lax.dynamic_slice_in_dim(r, r0, k)
        return pallas_block_forces_streamed(
            cfg, xi, yi, mi, ri, x, y, m, r, row_g0=r0, col_g0=0,
            interpret=cfg.pallas_interpret, biased=biased, accum=cfg.accum)

    @jax.jit
    def integrate(st, xf, yf):
        xv, yv = compute_velocities(cfg, st.xv, st.yv, xf, yf, st.mass)
        x, y, xv, yv = compute_positions(cfg, st.x, st.y, xv, yv,
                                         mass=st.mass)
        return State(x, y, xv, yv, xf, yf, st.mass, st.radius)

    coincident = jax.jit(any_coincident)

    # AOT-compiled executables are stored and INVOKED directly (lower+compile
    # does not populate the jit dispatch cache, so calling the jitted
    # functions would re-compile inside the timed region).
    vec = jax.ShapeDtypeStruct((n,), dtype)
    i32 = jax.ShapeDtypeStruct((), jnp.int32)
    compiled = {}

    def _get(key):
        if key not in compiled:
            if key == "integrate":
                st = State(*(vec,) * 8)
                compiled[key] = integrate.lower(st, vec, vec).compile()
            elif key == "coincident":
                compiled[key] = coincident.lower(vec, vec, vec).compile()
            else:
                k, biased = key
                compiled[key] = force_rows.lower(
                    vec, vec, vec, vec, i32, k=k, biased=biased).compile()
        return compiled[key]

    def warmup():
        for k in chunk_sizes:
            for biased in (True, False):
                _get((k, biased))
        _get("integrate")
        _get("coincident")

    def step_fn(state: State, fence=None) -> State:
        biased = bool(_get("coincident")(state.x, state.y, state.mass))
        fxs, fys = [], []
        for r0 in range(0, n, row_chunk):
            k = min(row_chunk, n - r0)
            fx, fy = _get((k, biased))(state.x, state.y, state.mass,
                                       state.radius, jnp.int32(r0))
            if fence is not None:
                fence(fx)
            fxs.append(fx)
            fys.append(fy)
        xf = jnp.concatenate(fxs)
        yf = jnp.concatenate(fys)
        return _get("integrate")(state, xf, yf)

    return step_fn, warmup


def total_energy(cfg: SimConfig, state: State) -> jnp.ndarray:
    """Diagnostic: kinetic + (softened) potential energy.

    The reference has no energy accounting; this supports the long-run drift
    regression (SURVEY.md §4, BASELINE.json config 3).  Uses the same softened
    denominator as the force law (potential consistent with
    F = -G m_i m_j / max(d^2, mind^2) along the pair axis).
    """
    ke = 0.5 * jnp.sum(state.mass * (state.xv**2 + state.yv**2))
    dx = state.x[None, :] - state.x[:, None]
    dy = state.y[None, :] - state.y[:, None]
    dsqr = dx * dx + dy * dy
    mind = state.radius[:, None] + state.radius[None, :]
    d = jnp.sqrt(jnp.maximum(jnp.maximum(dsqr, mind * mind), 1e-30))
    n = state.n
    rows = lax.broadcasted_iota(jnp.int32, (n, n), 0)
    cols = lax.broadcasted_iota(jnp.int32, (n, n), 1)
    pair_pe = jnp.where(rows < cols,
                        -cfg.gravity * state.mass[:, None]
                        * state.mass[None, :] / d,
                        jnp.zeros((), state.x.dtype))
    return ke + jnp.sum(pair_pe)
