"""Pallas force-kernel tests (interpret mode on CPU; the real-TPU validation
runs in benchmarks and on hardware).

Covers the VMEM-resident kernel, the HBM-streamed grid-pipelined kernel
(the entire N >= 256K story), the dispatch boundary between them, and the
composition with the sharded all-gather / ppermute-ring paths.
"""

import jax
import numpy as np
import pytest

from parallel_nbody_tpu.config import SimConfig
from parallel_nbody_tpu.ops import pallas_step
from parallel_nbody_tpu.ops.forces import compute_forces_dense
from parallel_nbody_tpu.ops.pallas_step import (
    pallas_block_forces, pallas_block_forces_streamed, pallas_forces)
from parallel_nbody_tpu.state import pad_state, random_state

CFG = SimConfig(force_mode="fast", dtype="float32")


def _forces(st, **kw):
    return pallas_forces(CFG, st.x, st.y, st.mass, st.radius,
                         interpret=True, **kw)


def _assert_close(got, want, rtol=2e-3, atol=1e-2):
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=rtol, atol=atol)


def test_matches_dense_fast_path():
    st = random_state(512, CFG, jax.random.PRNGKey(0))
    xf, yf = _forces(st, tile_i=128, tile_j=256)
    xf_d, yf_d = compute_forces_dense(CFG, st.x, st.y, st.mass, st.radius)
    _assert_close(xf, xf_d)
    _assert_close(yf, yf_d)


def test_padding_bodies_get_and_exert_zero_force():
    st = random_state(100, CFG, jax.random.PRNGKey(1))
    padded, n = pad_state(st, 128)
    xf, yf = _forces(padded, tile_i=64, tile_j=128)
    assert np.isfinite(np.asarray(xf)).all()
    np.testing.assert_array_equal(np.asarray(xf)[n:], 0.0)
    np.testing.assert_array_equal(np.asarray(yf)[n:], 0.0)
    # Real bodies unaffected by padding: compare against unpadded dense.
    xf_d, _ = compute_forces_dense(CFG, st.x, st.y, st.mass, st.radius)
    _assert_close(np.asarray(xf)[:n], xf_d)


def test_awkward_sizes_pad_internally():
    # 96 is not divisible by 64; the kernel pads to the tile multiple with
    # inert bodies (it must NOT shrink the tile) and must still be correct.
    st = random_state(96, CFG, jax.random.PRNGKey(2))
    xf, yf = _forces(st, tile_i=64, tile_j=64)
    assert xf.shape == (96,)
    xf_d, yf_d = compute_forces_dense(CFG, st.x, st.y, st.mass, st.radius)
    _assert_close(xf, xf_d)
    _assert_close(yf, yf_d)


def test_momentum_conservation():
    st = random_state(256, CFG, jax.random.PRNGKey(3))
    xf, yf = _forces(st, tile_i=128, tile_j=128)
    # One-sided evaluation still conserves total momentum to fp32 round-off.
    total = abs(float(np.sum(np.asarray(xf, np.float64))))
    scale = float(np.abs(np.asarray(xf)).max())
    assert total < 1e-3 * scale


# ---------------------------------------------------------------------------
# HBM-streamed kernel (pallas_block_forces_streamed)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("m, k, band, tile_i, tile_j", [
    (512, 512, 256, 128, 128),   # square, multiple bands
    (384, 640, 256, 128, 128),   # rectangular, k pads 640 -> 768
    (256, 1000, 256, 64, 128),   # awkward k, row/col tiles differ
    (512, 512, 512, 128, 256),   # single band == whole block
    (200, 520, 256, 128, 128),   # both axes awkward
])
def test_streamed_matches_dense(m, k, band, tile_i, tile_j):
    sti = random_state(m, CFG, jax.random.PRNGKey(4))
    stj = random_state(k, CFG, jax.random.PRNGKey(5))
    xf, yf = pallas_block_forces_streamed(
        CFG, sti.x, sti.y, sti.mass, sti.radius,
        stj.x, stj.y, stj.mass, stj.radius,
        tile_i=tile_i, tile_j=tile_j, band=band, interpret=True)
    assert xf.shape == (m,)
    # Oracle: the VMEM-resident kernel over the same blocks (itself verified
    # against the dense XLA op above).
    xf_r, yf_r = pallas_block_forces(
        CFG, sti.x, sti.y, sti.mass, sti.radius,
        stj.x, stj.y, stj.mass, stj.radius,
        tile_i=tile_i, tile_j=tile_j, interpret=True)
    _assert_close(xf, xf_r, rtol=1e-5, atol=1e-4)
    _assert_close(yf, yf_r, rtol=1e-5, atol=1e-4)


def test_streamed_square_matches_dense_oracle():
    st = random_state(512, CFG, jax.random.PRNGKey(6))
    xf, yf = pallas_block_forces_streamed(
        CFG, st.x, st.y, st.mass, st.radius,
        st.x, st.y, st.mass, st.radius,
        tile_i=128, tile_j=128, band=256, interpret=True)
    xf_d, yf_d = compute_forces_dense(CFG, st.x, st.y, st.mass, st.radius)
    _assert_close(xf, xf_d)
    _assert_close(yf, yf_d)


def test_vmem_dispatch_boundary(monkeypatch):
    """pallas_forces must route N <= limit to the resident kernel and
    N > limit to the streamed kernel, with identical results either side."""
    calls = []
    orig_resident = pallas_step.pallas_block_forces
    orig_streamed = pallas_step.pallas_block_forces_streamed

    def spy_resident(*a, **kw):
        calls.append("resident")
        return orig_resident(*a, **kw)

    def spy_streamed(*a, **kw):
        calls.append("streamed")
        return orig_streamed(*a, **kw)

    monkeypatch.setattr(pallas_step, "pallas_block_forces", spy_resident)
    monkeypatch.setattr(pallas_step, "pallas_block_forces_streamed",
                        spy_streamed)
    monkeypatch.setattr(pallas_step, "_VMEM_RESIDENT_LIMIT", 256)

    at_limit = random_state(256, CFG, jax.random.PRNGKey(7))
    above = random_state(320, CFG, jax.random.PRNGKey(7))

    pallas_forces(CFG, at_limit.x, at_limit.y, at_limit.mass,
                  at_limit.radius, interpret=True)
    assert calls == ["resident"]

    xf, yf = pallas_forces(CFG, above.x, above.y, above.mass, above.radius,
                           interpret=True)
    assert calls == ["resident", "streamed"]
    xf_d, yf_d = compute_forces_dense(CFG, above.x, above.y, above.mass,
                                      above.radius)
    _assert_close(xf, xf_d)
    _assert_close(yf, yf_d)


# ---------------------------------------------------------------------------
# Composition with the sharded paths (virtual CPU mesh, interpret mode)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("comm", ["allgather", "ring"])
def test_sharded_pallas_matches_dense(comm):
    from parallel_nbody_tpu.models.engine import run
    from parallel_nbody_tpu.parallel.mesh import make_mesh, shard_state
    from parallel_nbody_tpu.parallel.sharded_step import make_sharded_run
    from parallel_nbody_tpu.state import init_state, unpad_state

    cfg = CFG.replace(kernel="pallas", pallas_interpret=True,
                      tile_i=64, tile_j=64)
    n_dev, n, steps = 4, 256, 5
    mesh = make_mesh(n_dev)
    assert mesh.size == n_dev
    st = init_state(n, cfg)
    padded, n_real = pad_state(st, n_dev)
    padded = shard_state(padded, mesh)
    out = make_sharded_run(cfg, mesh, steps, comm)(padded)
    out = unpad_state(jax.device_get(out), n_real)

    ref = run(cfg.replace(kernel="xla"), init_state(n, cfg), steps)
    _assert_close(out.x, ref.x, rtol=1e-4, atol=1e-3)
    _assert_close(out.y, ref.y, rtol=1e-4, atol=1e-3)
    _assert_close(out.xv, ref.xv, rtol=1e-3, atol=1e-3)


@pytest.mark.parametrize("path", ["allgather", "ring", "grid2d"])
def test_sharded_paths_stream_above_vmem_limit(monkeypatch, path):
    """VERDICT r2 #2: with the VMEM-resident limit forced low, every sharded
    Pallas path must route its (gathered/visiting) column block through the
    HBM-streamed kernel and still match the dense oracle — so multi-chip N
    has no 128K-column ceiling (reference bar: Allgatherv scales unbounded,
    nbody-par.c:913-917)."""
    from parallel_nbody_tpu.parallel.grid2d import (make_grid2d_run,
                                                    make_mesh2d,
                                                    shard_state_2d)
    from parallel_nbody_tpu.parallel.mesh import make_mesh, shard_state
    from parallel_nbody_tpu.parallel.sharded_step import make_sharded_run
    from parallel_nbody_tpu.state import init_state, unpad_state

    calls = []
    orig_streamed = pallas_step.pallas_block_forces_streamed

    def spy_streamed(*a, **kw):
        calls.append("streamed")
        return orig_streamed(*a, **kw)

    monkeypatch.setattr(pallas_step, "pallas_block_forces_streamed",
                        spy_streamed)
    # 256-body runs: allgather columns = 256, grid2d col chunks = 64 rows x
    # 128 gathered rows... the ring's visiting block is only N/P = 64 (it is
    # the one path whose per-call column block shrinks with P), so it needs
    # a lower forced limit to exercise streaming.
    monkeypatch.setattr(pallas_step, "_VMEM_RESIDENT_LIMIT",
                        48 if path == "ring" else 96)

    cfg = CFG.replace(kernel="pallas", pallas_interpret=True,
                      tile_i=64, tile_j=64)
    n, steps = 256, 3
    st = init_state(n, cfg)

    if path == "grid2d":
        mesh = make_mesh2d(2, 2)
        padded, n_real = pad_state(st, 4)
        padded = shard_state_2d(padded, mesh)
        out = make_grid2d_run(cfg, mesh, steps)(padded)
    else:
        mesh = make_mesh(4)
        padded, n_real = pad_state(st, 4)
        padded = shard_state(padded, mesh)
        out = make_sharded_run(cfg, mesh, steps, path)(padded)
    out = unpad_state(jax.device_get(out), n_real)
    assert calls, "streamed kernel was never dispatched"

    from parallel_nbody_tpu.models.engine import run
    ref = run(cfg.replace(kernel="xla"), init_state(n, cfg), steps)
    _assert_close(out.x, ref.x, rtol=1e-4, atol=1e-3)
    _assert_close(out.xv, ref.xv, rtol=1e-3, atol=1e-3)


def test_streamed_row_chunks_with_row_g0_match_square():
    """The benchmarks/huge_n.py access pattern: row-chunked calls over a
    shared column set, with TRACED row_g0 offsets and the biased kernel.
    A wrong/omitted row_g0 misplaces the overlap segment and hands every
    body a spurious self-kick — this pins chunked == square, with a
    coincident pair split across row chunks."""
    import jax.numpy as jnp
    from jax import lax

    n, row_chunk = 256, 64
    st = random_state(n, CFG, jax.random.PRNGKey(1))
    # A coincident pair crossing the chunk-0/chunk-2 boundary.
    x = st.x.at[130].set(st.x[3])
    y = st.y.at[130].set(st.y[3])

    want_x, want_y = pallas_block_forces_streamed(
        CFG, x, y, st.mass, st.radius, x, y, st.mass, st.radius,
        interpret=True, biased=True)

    @jax.jit
    def rows(r0):
        xi = lax.dynamic_slice_in_dim(x, r0, row_chunk)
        yi = lax.dynamic_slice_in_dim(y, r0, row_chunk)
        mi = lax.dynamic_slice_in_dim(st.mass, r0, row_chunk)
        ri = lax.dynamic_slice_in_dim(st.radius, r0, row_chunk)
        return pallas_block_forces_streamed(
            CFG, xi, yi, mi, ri, x, y, st.mass, st.radius,
            row_g0=r0, col_g0=0, interpret=True, biased=True)

    got_x = jnp.concatenate([rows(c)[0] for c in range(0, n, row_chunk)])
    got_y = jnp.concatenate([rows(c)[1] for c in range(0, n, row_chunk)])
    np.testing.assert_array_equal(np.asarray(got_x), np.asarray(want_x))
    np.testing.assert_array_equal(np.asarray(got_y), np.asarray(want_y))


def test_hosted_row_step_matches_fused_step():
    """models.engine.make_hosted_row_step (the CLI's huge-N path, VERDICT r3
    #4) must step identically to the fused engine — row-chunked force
    dispatches with a tail chunk, host-side coincidence dispatch, AOT
    warmup."""
    import numpy as np
    from parallel_nbody_tpu.models.engine import make_hosted_row_step, run
    from parallel_nbody_tpu.state import init_state
    cfg = SimConfig(force_mode="fast", dtype="float32", kernel="pallas",
                    pallas_interpret=True)
    n = 515  # not a row_chunk multiple: exercises the tail-chunk program
    st = init_state(n, cfg)
    step_fn, warmup = make_hosted_row_step(cfg, n, row_chunk=128)
    warmup()
    got = step_fn(step_fn(st))
    want = run(cfg, st, 2)
    for f in ("x", "y", "xv", "yv", "xf", "yf"):
        np.testing.assert_allclose(
            np.asarray(getattr(got, f), np.float64),
            np.asarray(getattr(want, f), np.float64),
            rtol=1e-5, atol=1e-3, err_msg="field " + f)
