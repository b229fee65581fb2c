"""Pairwise gravitational forces (dense XLA formulation).

Physics contract (reference: nbody/nbody-seq.c:79-109, identical per-pair math
in nbody/nbody-par.c:338-359):

  for each unordered pair (i, j), i < j:
      dx     = x[j] - x[i]
      dy     = y[j] - y[i]
      angle  = atan2(dy, dx)
      dsqr   = dx^2 + dy^2
      forced = max(dsqr, (r_i + r_j)^2)         # plummer-less softening
      force  = m_i * m_j * G / forced
      fx     = force * cos(angle)               # trig decomposition — parity-
      fy     = force * sin(angle)               # sensitive (NOT dx/|d|)
      F[i] += (fx, fy);  F[j] -= (fx, fy)       # Newton's 3rd law

The dense op materializes the (N, N) pair matrix once per step — the right
shape for XLA fusion on a single chip at small/medium N.  The Pallas kernel in
ops/pallas_step.py tiles the same computation through VMEM for large N, and
parallel/sharded_step.py shards the row axis over a device mesh.

``mode="trig"`` keeps the reference's transcendental decomposition and the
upper-triangle ± accumulation (pair values computed once, exactly like the C
loop).  ``mode="fast"`` is the TPU speed-of-light path: algebraically equal
``force * dx * rsqrt(dsqr)``, full (i != j) matrix so each row sums
independently (the same redundancy model the reference's MPI version uses for
cross-rank pairs, nbody-par.c:302-308).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from ..config import SimConfig

# Clamp for the softened denominator.  Real bodies always have
# (r_i + r_j)^2 >= 4 (radius >= 1, nbody-seq.c:444), so this only guards
# zero-mass padding bodies from producing 0/0 = NaN.
_DENOM_FLOOR = 1e-30


def pair_forces_trig(cfg: SimConfig, x, y, mass, radius):
    """Upper-triangle pair force matrix with the reference's trig math.

    Returns (fx, fy) where entry [i, j] (i < j) is the force of j on i along
    +x/+y; entries with i >= j are zero.
    """
    dx = x[None, :] - x[:, None]
    dy = y[None, :] - y[:, None]
    angle = jnp.arctan2(dy, dx)
    dsqr = dx * dx + dy * dy
    mind = radius[:, None] + radius[None, :]
    forced = jnp.maximum(jnp.maximum(dsqr, mind * mind), _DENOM_FLOOR)
    force = mass[:, None] * mass[None, :] * cfg.gravity / forced
    fx = force * jnp.cos(angle)
    fy = force * jnp.sin(angle)
    n = x.shape[0]
    rows = lax.broadcasted_iota(jnp.int32, (n, n), 0)
    cols = lax.broadcasted_iota(jnp.int32, (n, n), 1)
    upper = rows < cols
    zero = jnp.zeros((), x.dtype)
    return jnp.where(upper, fx, zero), jnp.where(upper, fy, zero)


def compute_forces_dense(cfg: SimConfig, x, y, mass, radius):
    """Total force on every body, dense O(N^2).

    Returns (xf, yf) with shape (N,).
    """
    if cfg.force_mode == "trig":
        fx, fy = pair_forces_trig(cfg, x, y, mass, radius)
        # Pair value computed once per (i<j), applied +/- to both owners —
        # mirrors the C accumulation (nbody-seq.c:103-106).
        xf = jnp.sum(fx, axis=1) - jnp.sum(fx, axis=0)
        yf = jnp.sum(fy, axis=1) - jnp.sum(fy, axis=0)
        return xf, yf
    return _forces_fast_block(cfg, x, y, mass, x, y, mass, radius, radius,
                              same_block=True)


def _forces_fast_block(cfg, xi, yi, mi, xj, yj, mj, ri, rj, *, same_block):
    """Fast-path force of every body in block J on every body in block I.

    One-sided accumulation (each row block computes its own forces over all
    columns), i.e. the cross-block redundancy model of nbody-par.c:302-308.
    ``same_block=True`` masks the self-pair diagonal.
    """
    dx = xj[None, :] - xi[:, None]
    dy = yj[None, :] - yi[:, None]
    dsqr = dx * dx + dy * dy
    mind = ri[:, None] + rj[None, :]
    forced = jnp.maximum(jnp.maximum(dsqr, mind * mind), _DENOM_FLOOR)
    # Direction = unit vector of (dx, dy): cos(atan2(dy,dx)) == dx * rsqrt(dsqr).
    inv_r = jnp.where(dsqr > 0, lax.rsqrt(jnp.maximum(dsqr, _DENOM_FLOOR)), 0)
    scale = mi[:, None] * mj[None, :] * cfg.gravity / forced * inv_r
    if same_block:
        n = xi.shape[0]
        rows = lax.broadcasted_iota(jnp.int32, (n, n), 0)
        cols = lax.broadcasted_iota(jnp.int32, (n, n), 1)
        scale = jnp.where(rows == cols, jnp.zeros((), xi.dtype), scale)
    return jnp.sum(scale * dx, axis=1), jnp.sum(scale * dy, axis=1)


def forces_block_vs_full(cfg: SimConfig, x_blk, y_blk, m_blk, r_blk,
                         x_full, y_full, m_full, r_full, blk_offset):
    """Force on an owned body block from ALL bodies (gathered full arrays).

    This is the sharded analog of nbody-par.c:285-359: the owned block's
    internal pairs use the once-per-pair triangle accumulation (parity with
    the sequential program), while owned-vs-remote pairs are one-sided.
    ``blk_offset`` (traced) is the block's global starting index.

    In "fast" mode the whole thing is a single one-sided pass with the
    self-pair diagonal masked.
    """
    shard = x_blk.shape[0]
    n = x_full.shape[0]
    dtype = x_blk.dtype
    cols = lax.broadcasted_iota(jnp.int32, (shard, n), 1)
    zero = jnp.zeros((), dtype)

    if cfg.force_mode == "trig":
        dx = x_full[None, :] - x_blk[:, None]
        dy = y_full[None, :] - y_blk[:, None]
        angle = jnp.arctan2(dy, dx)
        dsqr = dx * dx + dy * dy
        mind = r_blk[:, None] + r_full[None, :]
        forced = jnp.maximum(jnp.maximum(dsqr, mind * mind), _DENOM_FLOOR)
        force = m_blk[:, None] * m_full[None, :] * cfg.gravity / forced
        own = (cols >= blk_offset) & (cols < blk_offset + shard)
        force = jnp.where(own, zero, force)
        xf = jnp.sum(force * jnp.cos(angle), axis=1)
        yf = jnp.sum(force * jnp.sin(angle), axis=1)
        fx, fy = pair_forces_trig(cfg, x_blk, y_blk, m_blk, r_blk)
        return (xf + jnp.sum(fx, axis=1) - jnp.sum(fx, axis=0),
                yf + jnp.sum(fy, axis=1) - jnp.sum(fy, axis=0))

    rows = lax.broadcasted_iota(jnp.int32, (shard, n), 0)
    dx = x_full[None, :] - x_blk[:, None]
    dy = y_full[None, :] - y_blk[:, None]
    dsqr = dx * dx + dy * dy
    mind = r_blk[:, None] + r_full[None, :]
    forced = jnp.maximum(jnp.maximum(dsqr, mind * mind), _DENOM_FLOOR)
    inv_r = jnp.where(dsqr > 0, lax.rsqrt(jnp.maximum(dsqr, _DENOM_FLOOR)), 0)
    scale = m_blk[:, None] * m_full[None, :] * cfg.gravity / forced * inv_r
    scale = jnp.where(cols == rows + blk_offset, zero, scale)
    return jnp.sum(scale * dx, axis=1), jnp.sum(scale * dy, axis=1)


def forces_on_block(cfg: SimConfig, xi, yi, mi, ri, xj, yj, mj, rj,
                    same_block: bool):
    """Public block-on-block force (used by the sharded and ring paths)."""
    if cfg.force_mode == "trig" and same_block:
        fx, fy = pair_forces_trig(cfg, xi, yi, mi, ri)
        return jnp.sum(fx, axis=1) - jnp.sum(fx, axis=0), \
               jnp.sum(fy, axis=1) - jnp.sum(fy, axis=0)
    if cfg.force_mode == "trig":
        dx = xj[None, :] - xi[:, None]
        dy = yj[None, :] - yi[:, None]
        angle = jnp.arctan2(dy, dx)
        dsqr = dx * dx + dy * dy
        mind = ri[:, None] + rj[None, :]
        forced = jnp.maximum(jnp.maximum(dsqr, mind * mind), _DENOM_FLOOR)
        force = mi[:, None] * mj[None, :] * cfg.gravity / forced
        return (jnp.sum(force * jnp.cos(angle), axis=1),
                jnp.sum(force * jnp.sin(angle), axis=1))
    return _forces_fast_block(cfg, xi, yi, mi, xj, yj, mj, ri, rj,
                              same_block=same_block)
