"""Pallas TPU force kernel — the hot O(N^2) loop, tiled through VMEM.

This is the TPU-native replacement for the reference's compute_forces
(nbody-seq.c:79-109 / nbody-par.c:285-359, where OpenMP shared the pair loop
across cores).  Design:

  - Body arrays live in VMEM as (1, N) vectors (lane-major layout); at any
    parity-relevant N (up to the 128K resident limit) all four fit
    comfortably.
  - The grid walks row tiles of the interaction matrix; each program computes
    the total force on TILE_I bodies by sweeping column tiles of TILE_J
    bodies with a fori_loop, keeping every intermediate (TILE_I, TILE_J)
    block in VMEM/registers.
  - Transcendental-free except ONE rsqrt per pair:
        scale = m_j * rsqrt(forced^2 * dsqr)
    which equals m_j / (forced * |d|); the row factor G * m_i is applied once
    per row AFTER the column reduction, so the inner loop is ~14 VPU ops/pair.
  - Self-pairs and zero-mass padding need no masks: dsqr == 0 gives
    rsqrt(eps-floored 0) -> huge but finite, then scale * dx == 0; far-away
    padding overflows forced^2*dsqr to +inf and rsqrt(inf) == 0.
  - Softening ``max(dsqr, (r_i+r_j)^2)`` exactly as in the reference.

The kernel is rectangular (row block x column block), so the same code path
serves the single-chip square case, the sharded all-gather case (local rows x
gathered columns) and the ppermute ring case (local rows x visiting block) —
the TPU analogs of the reference's owned-x-owned / owned-x-remote split.

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

# Far-outside-the-arena position for padding bodies (matches state.pad_state):
# dsqr against any real body overflows forced^2*dsqr toward +inf in fp32, so
# rsqrt gives 0; padding-vs-padding pairs hit the _EPS floor with zero mass.
_FAR = 1e9


def _round_up(v: int, m: int) -> int:
    return -(-v // m) * m


def _pad_lane(a, size: int, fill: float):
    """Pad a 1-D body array up to ``size`` lanes."""
    n = a.shape[0]
    if n == size:
        return a
    return jnp.concatenate([a, jnp.full((size - n,), fill, a.dtype)])


def _pad_block(x, y, m, r, size: int):
    """Pad one body block (positions far away, zero mass/radius) so padding
    bodies neither feel nor exert force — the internal analog of
    state.pad_state, applied per-kernel so awkward N never shrinks the tile
    (tiny tiles fail Mosaic lane alignment on real TPUs and waste the VPU)."""
    return (_pad_lane(x, size, _FAR), _pad_lane(y, size, _FAR),
            _pad_lane(m, size, 0.0), _pad_lane(r, size, 0.0))


def _force_kernel(xi_ref, yi_ref, mi_ref, ri_ref,
                  xj_ref, yj_ref, mj_ref, rj_ref,
                  xf_ref, yf_ref,
                  *, tile_i: int, tile_j: int, n_cols: int, gravity: float):
    i = pl.program_id(0)
    row0 = i * tile_i

    xi = xi_ref[0, pl.ds(row0, tile_i)].reshape(tile_i, 1)
    yi = yi_ref[0, pl.ds(row0, tile_i)].reshape(tile_i, 1)
    ri = ri_ref[0, pl.ds(row0, tile_i)].reshape(tile_i, 1)

    def col_step(j, acc):
        acc_x, acc_y = acc
        col0 = j * tile_j
        xj = xj_ref[0, pl.ds(col0, tile_j)].reshape(1, tile_j)
        yj = yj_ref[0, pl.ds(col0, tile_j)].reshape(1, tile_j)
        mj = mj_ref[0, pl.ds(col0, tile_j)].reshape(1, tile_j)
        rj = rj_ref[0, pl.ds(col0, tile_j)].reshape(1, tile_j)

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

    zeros = jnp.zeros((tile_i, 1), xi_ref.dtype)
    acc_x, acc_y = lax.fori_loop(0, n_cols // tile_j, col_step,
                                 (zeros, zeros))

    # Row factor G * m_i applied once after the reduction.
    gmi = mi_ref[0, pl.ds(row0, tile_i)].reshape(tile_i, 1) * gravity
    xf_ref[0, pl.ds(row0, tile_i)] = (acc_x * gmi).reshape(tile_i)
    yf_ref[0, pl.ds(row0, tile_i)] = (acc_y * gmi).reshape(tile_i)


def pallas_block_forces(cfg, xi, yi, mi, ri, xj, yj, mj, rj, *,
                        tile_i: int = 1024, tile_j: int = 1024,
                        interpret: bool = False):
    """Force of every body in block J on every body in block I (one-sided,
    fast mode).  Block I of size M, block J of size K; block sizes that are
    not tile multiples are padded internally with inert far-away bodies (the
    tile size is never shrunk — see _pad_block)."""
    m = xi.shape[0]
    k = xj.shape[0]
    # Keep the requested tile but never larger than the (lane-aligned) block.
    tile_i = min(tile_i, _round_up(m, 128))
    tile_j = min(tile_j, _round_up(k, 128))
    m_pad = _round_up(m, tile_i)
    k_pad = _round_up(k, tile_j)
    xi, yi, mi, ri = _pad_block(xi, yi, mi, ri, m_pad)
    xj, yj, mj, rj = _pad_block(xj, yj, mj, rj, k_pad)
    dtype = xi.dtype

    kernel = functools.partial(
        _force_kernel, tile_i=tile_i, tile_j=tile_j, n_cols=k_pad,
        gravity=float(cfg.gravity))

    vec = pl.BlockSpec(memory_space=pltpu.VMEM)
    xf, yf = pl.pallas_call(
        kernel,
        grid=(m_pad // tile_i,),
        in_specs=[vec] * 8,
        out_specs=(vec, vec),
        out_shape=(jax.ShapeDtypeStruct((1, m_pad), dtype),
                   jax.ShapeDtypeStruct((1, m_pad), dtype)),
        cost_estimate=pl.CostEstimate(
            flops=15 * m_pad * k_pad,
            bytes_accessed=(4 * m_pad + 4 * k_pad) * 4,
            transcendentals=m_pad * k_pad),
        interpret=interpret,
    )(xi.reshape(1, m_pad), yi.reshape(1, m_pad),
      mi.reshape(1, m_pad), ri.reshape(1, m_pad),
      xj.reshape(1, k_pad), yj.reshape(1, k_pad),
      mj.reshape(1, k_pad), rj.reshape(1, k_pad))
    return xf.reshape(m_pad)[:m], yf.reshape(m_pad)[:m]


def _force_kernel_streamed(xi_ref, yi_ref, mi_ref, ri_ref,
                           xj_ref, yj_ref, mj_ref, rj_ref,
                           xf_ref, yf_ref,
                           *, tile_i: int, tile_j: int, band: int,
                           gravity: float):
    """Grid-pipelined variant: grid = (row tiles, column bands); Pallas
    streams (1, band) column bands HBM->VMEM with automatic double buffering,
    so the body arrays never need to fit in VMEM (N is unbounded).  Inside
    each band the kernel loops over tile_j-wide sub-tiles to bound the
    (tile_i, tile_j) intermediates.

    The output block (same row tile for every band) stays resident in VMEM
    and is the accumulator — the classic revisited-output reduction.
    """
    j = pl.program_id(1)
    nj = pl.num_programs(1)

    xi = xi_ref[:].reshape(tile_i, 1)
    yi = yi_ref[:].reshape(tile_i, 1)
    ri = ri_ref[:].reshape(tile_i, 1)

    def sub_step(s, acc):
        acc_x, acc_y = acc
        c0 = s * tile_j
        xj = xj_ref[0, pl.ds(c0, tile_j)].reshape(1, tile_j)
        yj = yj_ref[0, pl.ds(c0, tile_j)].reshape(1, tile_j)
        mj = mj_ref[0, pl.ds(c0, tile_j)].reshape(1, tile_j)
        rj = rj_ref[0, pl.ds(c0, tile_j)].reshape(1, tile_j)

        dx = xj - xi
        dy = yj - yi
        dsqr = dx * dx + dy * dy
        mind = ri + rj
        forced = jnp.maximum(dsqr, mind * mind)
        inv = lax.rsqrt(jnp.maximum(forced * forced * dsqr, _EPS))
        scale = mj * inv
        acc_x = acc_x + jnp.sum(scale * dx, axis=1, keepdims=True)
        acc_y = acc_y + jnp.sum(scale * dy, axis=1, keepdims=True)
        return acc_x, acc_y

    zeros = jnp.zeros((tile_i, 1), xi_ref.dtype)
    fx, fy = lax.fori_loop(0, band // tile_j, sub_step, (zeros, zeros))
    fx = fx.reshape(1, tile_i)
    fy = fy.reshape(1, tile_i)

    @pl.when(j == 0)
    def _():
        xf_ref[:] = jnp.zeros_like(xf_ref)
        yf_ref[:] = jnp.zeros_like(yf_ref)

    xf_ref[:] += fx
    yf_ref[:] += fy

    @pl.when(j == nj - 1)
    def _():
        gmi = mi_ref[:] * gravity
        xf_ref[:] *= gmi
        yf_ref[:] *= gmi


def pallas_block_forces_streamed(cfg, xi, yi, mi, ri, xj, yj, mj, rj, *,
                                 tile_i: int = 512, tile_j: int = 1024,
                                 band: int = 65536,
                                 interpret: bool = False):
    """HBM-streaming block forces for N beyond the 128K VMEM-resident limit.

    Awkward sizes are padded to tile/band multiples with inert bodies rather
    than shrinking the tiles (see _pad_block)."""
    m_orig = xi.shape[0]
    k = xj.shape[0]
    tile_i = min(tile_i, _round_up(m_orig, 128))
    m = _round_up(m_orig, tile_i)
    tile_j = min(tile_j, _round_up(k, 128))
    band = max(tile_j, min(band, _round_up(k, tile_j)))
    band -= band % tile_j  # band must be a whole number of sub-tiles
    k_pad = _round_up(k, band)
    xi, yi, mi, ri = _pad_block(xi, yi, mi, ri, m)
    xj, yj, mj, rj = _pad_block(xj, yj, mj, rj, k_pad)
    k = k_pad
    dtype = xi.dtype

    kernel = functools.partial(
        _force_kernel_streamed, tile_i=tile_i, tile_j=tile_j, band=band,
        gravity=float(cfg.gravity))

    def row_spec():
        return pl.BlockSpec((1, tile_i), lambda i, j: (0, i),
                            memory_space=pltpu.VMEM)

    def col_spec():
        return pl.BlockSpec((1, band), lambda i, j: (0, j),
                            memory_space=pltpu.VMEM)

    xf, yf = pl.pallas_call(
        kernel,
        grid=(m // tile_i, k // band),
        in_specs=[row_spec(), row_spec(), row_spec(), row_spec(),
                  col_spec(), col_spec(), col_spec(), col_spec()],
        out_specs=(row_spec(), row_spec()),
        out_shape=(jax.ShapeDtypeStruct((1, m), dtype),
                   jax.ShapeDtypeStruct((1, m), dtype)),
        cost_estimate=pl.CostEstimate(
            flops=15 * m * k, bytes_accessed=(4 * m + 4 * k) * 4,
            transcendentals=m * k),
        interpret=interpret,
    )(xi.reshape(1, m), yi.reshape(1, m), mi.reshape(1, m), ri.reshape(1, m),
      xj.reshape(1, k), yj.reshape(1, k), mj.reshape(1, k), rj.reshape(1, k))
    return xf.reshape(m)[:m_orig], yf.reshape(m)[:m_orig]


# Above 128K bodies the four (1, N) fp32 vectors plus the (tile_i, tile_j)
# intermediates no longer fit in VMEM; the streamed kernel takes over.
_VMEM_RESIDENT_LIMIT = 1 << 17


def pallas_forces(cfg, x, y, mass, radius, *, tile_i: int = 1024,
                  tile_j: int = 1024, interpret: bool = False):
    """Total pairwise forces (square case) via the Pallas kernel.

    Dispatches to the VMEM-resident kernel for small/medium N and the
    HBM-streaming grid-pipelined kernel for large N.
    """
    if x.shape[0] > _VMEM_RESIDENT_LIMIT:
        # The streamed kernel has its own tuned tile defaults (the square
        # kernel's tiles are sized for VMEM-resident inputs).
        return pallas_block_forces_streamed(
            cfg, x, y, mass, radius, x, y, mass, radius, interpret=interpret)
    return pallas_block_forces(cfg, x, y, mass, radius, x, y, mass, radius,
                               tile_i=tile_i, tile_j=tile_j,
                               interpret=interpret)
