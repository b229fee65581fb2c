"""Multi-chip simulation step via shard_map over a 1-D body mesh.

TPU-native re-design of the reference's MPI layer (nbody-par.c):

  MPI_Bcast of the full world (:874)        -> mass/radius all-gathered ONCE
                                               per run (they never change);
                                               positions start sharded.
  per-step MPI_Allgatherv of 10-double      -> per-step lax.all_gather of ONLY
  body structs (:913-917)                      x and y (2 floats/body) over ICI
  block partitioner recvcounts/displs       -> equal shards via pad_state
  owned-triangle + owned-x-remote forces    -> ops.forces.forces_block_vs_full
  OpenMP loop sharding (:273,302,...)       -> VPU lanes / Pallas tiles

Two communication strategies:

  comm="allgather" — materialize all positions on every chip each step
    (the reference's scheme; memory O(N) per chip, one collective per step).

  comm="ring" — lax.ppermute streams body blocks around the ICI ring while
    each chip accumulates partial forces block-by-block (ring-attention-shaped
    all-pairs; memory O(N/P) per chip — the scaling path to N >= 1M).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..config import SimConfig
from ..ops.forces import forces_block_vs_full, forces_on_block
from ..ops.integrate import compute_positions, compute_velocities
from ..state import State
from .mesh import BODY_AXIS

_SPEC = P(BODY_AXIS)


def _local_forces_allgather(cfg, x, y, m_blk, r_blk, m_full, r_full):
    """Per-shard force computation with a full positional all-gather."""
    shard = x.shape[0]
    my = lax.axis_index(BODY_AXIS)
    x_full = lax.all_gather(x, BODY_AXIS, tiled=True)
    y_full = lax.all_gather(y, BODY_AXIS, tiled=True)
    if cfg.kernel == "pallas":
        # auto: streams the gathered column block through HBM above the
        # VMEM-resident limit, so sharded N is unbounded (VERDICT r2 #2).
        # The gathered positions also make the global coincident-pair test
        # cheap (O(N log N) vs the O(N^2/P) kernel), so this path gets the
        # same biased/unbiased runtime dispatch as the single-chip engine
        # (every shard computes the identical flag from identical gathered
        # data — no extra collective).  The ring/grid2d paths dispatch too,
        # per block pair, via the gid-tagged duplicate test (see
        # _local_forces_ring and grid2d._local_step).
        from ..ops.pallas_step import (forces_coincident_dispatch,
                                       pallas_block_forces_auto)

        return forces_coincident_dispatch(
            x_full, y_full, m_full,
            lambda biased: pallas_block_forces_auto(
                cfg, x, y, m_blk, r_blk, x_full, y_full, m_full, r_full,
                row_g0=my * shard, col_g0=0,
                tile_i=cfg.tile_i, tile_j=cfg.tile_j,
                interpret=cfg.pallas_interpret, biased=biased,
                accum=cfg.accum))
    return forces_block_vs_full(cfg, x, y, m_blk, r_blk,
                                x_full, y_full, m_full, r_full,
                                my * shard)


def _local_forces_ring(cfg, x, y, m_blk, r_blk):
    """Per-shard force computation streaming blocks around the ring.

    Each chip keeps only O(N/P) state.  At ring step s the chip holds the
    block originally owned by device (my + s) mod P; it accumulates that
    block's pull on its own bodies, then forwards the visiting block to its
    left neighbor (so blocks travel the ring once).  The visiting-block
    ppermute is independent of the force computation for the current block,
    letting XLA overlap communication with compute.
    """
    p = lax.axis_size(BODY_AXIS)
    shard = x.shape[0]
    my = lax.axis_index(BODY_AXIS)
    perm = [(i, (i - 1) % p) for i in range(p)]  # send left, receive from right
    gid_own = my * shard + jnp.arange(shard, dtype=jnp.int32)

    def block_forces(s, vx, vy, vm, vr):
        # At ring step s the visiting block is the one originally owned by
        # device (my + s) mod P — its global offset drives self-pair masking
        # and coincident-pair signs.
        visit_g0 = ((my + s) % p) * shard

        if cfg.kernel == "pallas":
            # Self-pairs and coincident pairs are handled intrinsically via
            # the global-index bias (ops/pallas_step.py), so the visiting
            # block needs no own/remote distinction.  auto: streams visiting
            # blocks above the VMEM-resident limit.  The bias machinery is
            # gated per ring step by an exact own+visiting duplicate test
            # (tagged by global id, so a block visiting itself at s == 0
            # does not false-positive) — the ring analog of the allgather
            # path's runtime dispatch; no collective needed, since each
            # shard only requires the flag for ITS OWN row block vs the
            # block it currently holds.
            from ..ops.pallas_step import (any_coincident_tagged,
                                           pallas_block_forces_auto)

            def block_call(biased):
                return pallas_block_forces_auto(
                    cfg, x, y, m_blk, r_blk, vx, vy, vm, vr,
                    row_g0=my * shard, col_g0=visit_g0,
                    tile_i=cfg.tile_i, tile_j=cfg.tile_j,
                    interpret=cfg.pallas_interpret, accum=cfg.accum,
                    biased=biased)

            gid_visit = visit_g0 + jnp.arange(shard, dtype=jnp.int32)
            flag = any_coincident_tagged(
                jnp.concatenate([x, vx]), jnp.concatenate([y, vy]),
                jnp.concatenate([m_blk, vm]),
                jnp.concatenate([gid_own, gid_visit]))
            dxf, dyf = lax.cond(flag, lambda _: block_call(True),
                                lambda _: block_call(False), None)
        elif cfg.force_mode == "fast":
            # The fast path masks self-pairs by global index, so s == 0
            # (visiting block == own block) needs no special case.
            dxf, dyf = forces_on_block(cfg, x, y, m_blk, r_blk,
                                       vx, vy, vm, vr, same_block=False,
                                       gi0=my * shard, gj0=visit_g0)
        else:
            same = s == 0

            # ``same_block`` needs the triangle accumulation only in trig
            # mode; dispatch statically on the mode and dynamically on s via
            # lax.cond (shapes identical on both branches).
            def own_block(_):
                return forces_on_block(cfg, x, y, m_blk, r_blk,
                                       x, y, m_blk, r_blk, same_block=True)

            def remote_block(_):
                return forces_on_block(cfg, x, y, m_blk, r_blk,
                                       vx, vy, vm, vr, same_block=False,
                                       gi0=my * shard, gj0=visit_g0)

            dxf, dyf = lax.cond(same, own_block, remote_block, None)
        return dxf, dyf

    def body(s, carry):
        vb, xf, yf = carry
        dxf, dyf = block_forces(s, vb[0], vb[1], vb[2], vb[3])
        # The four visiting arrays ride ONE packed ppermute (a single ICI
        # collective launch per hop instead of four — same bytes, 4x fewer
        # launch latencies on real hardware).
        nvb = lax.ppermute(vb, BODY_AXIS, perm)
        return nvb, xf + dxf, yf + dyf

    # Only p-1 forwards are needed per step: the LAST visiting block is
    # consumed, not passed on, so its ring hop is peeled out of the loop
    # (saves one O(N/P) packed ppermute per simulation step — 1/p of the
    # ring traffic; at p == 1 the ring degenerates to zero collectives).
    zeros = jnp.zeros_like(x)
    vb, xf, yf = lax.fori_loop(
        0, p - 1, body, (jnp.stack([x, y, m_blk, r_blk]), zeros, zeros))
    dxf, dyf = block_forces(p - 1, vb[0], vb[1], vb[2], vb[3])
    return xf + dxf, yf + dyf


def _sharded_run_local(cfg: SimConfig, steps: int, comm: str,
                       x, y, xv, yv, xf, yf, m, r):
    """The per-device program (body of shard_map)."""
    if comm == "allgather":
        # Masses/radii are constant: gather them once (the Bcast analog).
        m_full = lax.all_gather(m, BODY_AXIS, tiled=True)
        r_full = lax.all_gather(r, BODY_AXIS, tiled=True)

    def body(_, carry):
        x, y, xv, yv, xf, yf = carry
        if comm == "allgather":
            xf, yf = _local_forces_allgather(cfg, x, y, m, r, m_full, r_full)
        else:
            xf, yf = _local_forces_ring(cfg, x, y, m, r)
        xv, yv = compute_velocities(cfg, xv, yv, xf, yf, m)
        x, y, xv, yv = compute_positions(cfg, x, y, xv, yv, mass=m)
        return x, y, xv, yv, xf, yf

    x, y, xv, yv, xf, yf = lax.fori_loop(
        0, steps, body, (x, y, xv, yv, xf, yf))
    return x, y, xv, yv, xf, yf, m, r


def make_sharded_run(cfg: SimConfig, mesh: Mesh, steps: int,
                     comm: str = "allgather"):
    """Build a jitted multi-chip runner: State (body-sharded, padded to the
    mesh size) -> State after ``steps`` steps, entirely on-device."""
    assert comm in ("allgather", "ring")
    local = functools.partial(_sharded_run_local, cfg, steps, comm)
    # pallas_call does not annotate its outputs' varying-mesh-axes, so the
    # vma check must be off for the Pallas kernel path.
    sharded = shard_map(local, mesh=mesh,
                        in_specs=(_SPEC,) * 8, out_specs=(_SPEC,) * 8,
                        check_vma=cfg.kernel != "pallas")

    @jax.jit
    def run_sharded(state: State) -> State:
        return State(*sharded(*state))

    return run_sharded


def make_sharded_step(cfg: SimConfig, mesh: Mesh, comm: str = "allgather"):
    """Single sharded step (used by the driver's dryrun and by callers that
    need per-step control, e.g. frame rendering)."""
    runner = make_sharded_run(cfg, mesh, 1, comm)
    return runner
