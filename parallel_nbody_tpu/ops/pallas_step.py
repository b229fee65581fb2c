"""Pallas TPU force kernel — the hot O(N^2) loop, tiled through VMEM.

This is the TPU-native replacement for the reference's compute_forces
(nbody-seq.c:79-109 / nbody-par.c:285-359, where OpenMP shared the pair loop
across cores).  Design:

  - Body arrays live in VMEM as (1, N) vectors (lane-major layout); at any
    parity-relevant N (up to ~256K) all four fit comfortably.
  - The grid walks row tiles of the N x N interaction matrix; each program
    computes the total force on TILE_I bodies by sweeping column tiles of
    TILE_J bodies with a fori_loop, keeping every intermediate
    (TILE_I, TILE_J) block in VMEM/registers.
  - Transcendental-free except ONE rsqrt per pair:
        scale = m_j * rsqrt(forced^2 * dsqr)
    which equals m_j / (forced * |d|); the row factor G * m_i is applied once
    per row AFTER the column reduction, so the inner loop is ~14 VPU ops/pair.
  - Self-pairs and zero-mass padding need no masks: dsqr == 0 gives
    rsqrt(eps-floored 0) -> huge but finite, then scale * dx == 0; far-away
    padding overflows forced^2*dsqr to +inf and rsqrt(inf) == 0.
  - Softening ``max(dsqr, (r_i+r_j)^2)`` exactly as in the reference.

One-sided accumulation (each row tile sums over ALL columns) follows the
reference's cross-rank redundancy model (nbody-par.c:302-308) rather than
Newton-3rd folding: on the VPU the duplicated multiply-adds are cheaper than
the cross-tile scatter a symmetric update would require.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Floor for forced^2 * dsqr.  Real pairs have forced >= 4 (radius >= 1), so
# this only de-NaNs coincident zero-mass padding pairs.
_EPS = 1e-30


def _force_kernel(x_ref, y_ref, m_ref, r_ref, xf_ref, yf_ref,
                  *, tile_i: int, tile_j: int, n: int, gravity: float):
    i = pl.program_id(0)
    row0 = i * tile_i

    xi = x_ref[0, pl.ds(row0, tile_i)].reshape(tile_i, 1)
    yi = y_ref[0, pl.ds(row0, tile_i)].reshape(tile_i, 1)
    ri = r_ref[0, pl.ds(row0, tile_i)].reshape(tile_i, 1)

    def col_step(j, acc):
        acc_x, acc_y = acc
        col0 = j * tile_j
        xj = x_ref[0, pl.ds(col0, tile_j)].reshape(1, tile_j)
        yj = y_ref[0, pl.ds(col0, tile_j)].reshape(1, tile_j)
        mj = m_ref[0, pl.ds(col0, tile_j)].reshape(1, tile_j)
        rj = r_ref[0, pl.ds(col0, tile_j)].reshape(1, tile_j)

        dx = xj - xi
        dy = yj - yi
        dsqr = dx * dx + dy * dy
        mind = ri + rj
        forced = jnp.maximum(dsqr, mind * mind)
        # 1 / (forced * |d|) in a single rsqrt; eps-floor only rescues the
        # all-zero padding corner (see module docstring).
        inv = lax.rsqrt(jnp.maximum(forced * forced * dsqr, _EPS))
        scale = mj * inv
        acc_x = acc_x + jnp.sum(scale * dx, axis=1, keepdims=True)
        acc_y = acc_y + jnp.sum(scale * dy, axis=1, keepdims=True)
        return acc_x, acc_y

    zeros = jnp.zeros((tile_i, 1), x_ref.dtype)
    acc_x, acc_y = lax.fori_loop(0, n // tile_j, col_step, (zeros, zeros))

    # Row factor G * m_i applied once after the reduction.
    mi = m_ref[0, pl.ds(row0, tile_i)].reshape(tile_i, 1)
    gmi = mi * gravity
    xf_ref[0, pl.ds(row0, tile_i)] = (acc_x * gmi).reshape(tile_i)
    yf_ref[0, pl.ds(row0, tile_i)] = (acc_y * gmi).reshape(tile_i)


def pallas_forces(cfg, x, y, mass, radius, *, tile_i: int = 256,
                  tile_j: int = 2048, interpret: bool = False):
    """Total pairwise forces via the Pallas kernel.

    Requires N to be a multiple of the tile sizes (use state.pad_state).
    One-sided accumulation over all columns; self-pairs contribute zero.
    """
    n = x.shape[0]
    tile_i = min(tile_i, n)
    tile_j = min(tile_j, n)
    assert n % tile_i == 0 and n % tile_j == 0, (n, tile_i, tile_j)
    dtype = x.dtype

    kernel = functools.partial(
        _force_kernel, tile_i=tile_i, tile_j=tile_j, n=n,
        gravity=float(cfg.gravity))

    vec = pl.BlockSpec(memory_space=pltpu.VMEM)
    xf, yf = pl.pallas_call(
        kernel,
        grid=(n // tile_i,),
        in_specs=[vec, vec, vec, vec],
        out_specs=(vec, vec),
        out_shape=(jax.ShapeDtypeStruct((1, n), dtype),
                   jax.ShapeDtypeStruct((1, n), dtype)),
        cost_estimate=pl.CostEstimate(
            flops=15 * n * n, bytes_accessed=8 * n * 4, transcendentals=n * n),
        interpret=interpret,
    )(x.reshape(1, n), y.reshape(1, n), mass.reshape(1, n),
      radius.reshape(1, n))
    return xf.reshape(n), yf.reshape(n)
