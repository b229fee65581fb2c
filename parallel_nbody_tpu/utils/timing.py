"""Instrumentation: wall-clock timing and communication-share measurement.

The reference brackets its per-step MPI_Allgatherv with MPI_Wtime under
``--measure-comm`` (nbody-par.c:912-918).  Under XLA the collective is fused
into one compiled program, so instead we time a comm-only program (the same
gathers, nothing else) and report its per-step cost — the async-dispatch-aware
analog of the bracket.  For deeper analysis use jax.profiler traces
(``trace`` below).
"""

from __future__ import annotations

import contextlib
import time

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import PartitionSpec as P

from ..config import SimConfig
from .output import nr_flops, pair_interactions


def measure_comm_fraction(cfg: SimConfig, mesh, state, comm: str,
                          iters: int = 30) -> float:
    """Per-step communication time (seconds) of the sharded step's collective.

    Times a jitted loop containing only the per-step collective (positional
    all-gather, the (p-1)-hop packed ppermute ring, or the grid2d row/col exchange +
    psum) over the same sharded arrays.
    """
    if comm == "grid2d":
        return _measure_comm_grid2d(mesh, state, iters)

    from ..parallel.mesh import BODY_AXIS

    spec = P(BODY_AXIS)

    def local(x, y):
        def body(_, carry):
            x, y = carry
            if comm == "allgather":
                xg = lax.all_gather(x, BODY_AXIS, tiled=True)
                yg = lax.all_gather(y, BODY_AXIS, tiled=True)
                shard = x.shape[0]
                me = lax.axis_index(BODY_AXIS)
                # Data-dependent slice back to the shard so the gather can't
                # be folded away.
                x = lax.dynamic_slice_in_dim(xg, me * shard, shard)
                y = lax.dynamic_slice_in_dim(yg, me * shard, shard)
            else:
                p = lax.axis_size(BODY_AXIS)
                perm = [(i, (i - 1) % p) for i in range(p)]

                # Mirror the real ring's traffic shape (sharded_step.py):
                # p-1 hops, each ONE packed (4, shard) ppermute carrying
                # x/y/mass/radius of the visiting block.
                def ring(_, vb):
                    return lax.ppermute(vb, BODY_AXIS, perm)

                vb = lax.fori_loop(0, p - 1, ring, jnp.stack([x, y, x, y]))
                x, y = vb[0], vb[1]
            return x, y

        return lax.fori_loop(0, iters, body, (x, y))

    f = jax.jit(jax.shard_map(local, mesh=mesh,
                              in_specs=(spec, spec), out_specs=(spec, spec)))
    jax.block_until_ready(f(state.x, state.y))  # compile
    t0 = time.time()
    jax.block_until_ready(f(state.x, state.y))
    return (time.time() - t0) / iters


def _measure_comm_grid2d(mesh, state, iters: int) -> float:
    """Comm-only timing of the 2-D decomposition's per-step exchange: row
    gather over cols + col gather over rows + the psum reduction."""
    from ..parallel.grid2d import _SPEC, COL_AXIS, ROW_AXIS

    def local(x, y):
        blk = x.shape[0]

        def body(_, carry):
            x, y = carry
            xr = lax.all_gather(x, COL_AXIS, tiled=True)
            yr = lax.all_gather(y, COL_AXIS, tiled=True)
            xc = lax.all_gather(x, ROW_AXIS, tiled=True)
            yc = lax.all_gather(y, ROW_AXIS, tiled=True)
            fx = lax.psum(xr + jnp.sum(xc) * 0, COL_AXIS)
            fy = lax.psum(yr + jnp.sum(yc) * 0, COL_AXIS)
            c = lax.axis_index(COL_AXIS)
            # Slice back to the shard so none of it can be folded away.
            x = lax.dynamic_slice_in_dim(fx, c * blk, blk) * 0 + x
            y = lax.dynamic_slice_in_dim(fy, c * blk, blk) * 0 + y
            return x, y

        return lax.fori_loop(0, iters, body, (x, y))

    f = jax.jit(jax.shard_map(local, mesh=mesh,
                              in_specs=(_SPEC, _SPEC),
                              out_specs=(_SPEC, _SPEC)))
    jax.block_until_ready(f(state.x, state.y))  # compile
    t0 = time.time()
    jax.block_until_ready(f(state.x, state.y))
    return (time.time() - t0) / iters


class StepTimer:
    """Wall-clock timing + the reference's throughput accounting."""

    def __init__(self, n: int, steps: int):
        self.n = n
        self.steps = steps
        self.rtime = 0.0

    def __enter__(self):
        self._t0 = time.time()
        return self

    def __exit__(self, *exc):
        self.rtime = time.time() - self._t0
        return False

    @property
    def gflops(self) -> float:
        return nr_flops(self.n, self.steps) / 1e9 / self.rtime

    @property
    def interactions_per_sec(self) -> float:
        return pair_interactions(self.n, self.steps) / self.rtime


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace context (the deep-profiling path the reference
    lacks; view with TensorBoard / xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


# Event-name scaffolding that is not XLA op execution (executor bookkeeping,
# host API waits, thread-pool idling, python TraceMe frames spelled
# "$file.py:line fn") and umbrella events that CONTAIN op executions (the
# step loop, lax.cond branches, jit entry spans) — both excluded from the
# op-time denominator, else their duration double-counts the leaf ops they
# wrap (observed: a sharded-ring trace carries conditional.* spans from the
# coincidence dispatch covering ~92 s of already-counted fusion time).
_TRACE_SCAFFOLD = ("thunkexecutor", "block_until_ready", "wait:", "wait for",
                   "$")
_TRACE_UMBRELLA = ("while", "conditional", "fusion_computation", "call",
                   "jit_", "jit(", "pjitfunction", "body", "cond_")
# Names marking collective communication (XLA HLO spellings) plus the CPU
# backend's cross-device rendezvous synchronization.
_TRACE_COLLECTIVE = ("all_gather", "all-gather", "allgather",
                     "collective_permute", "collective-permute", "ppermute",
                     "all_reduce", "all-reduce", "reduce_scatter",
                     "reduce-scatter", "all_to_all", "all-to-all",
                     "rendezvous")


def trace_comm_share(log_dir: str) -> dict:
    """Comm share extracted from an actual jax.profiler trace of a sharded
    program — the async-aware alternative (SURVEY.md §5 comm row) to the
    comm-only-program estimate of ``measure_comm_fraction``: instead of
    re-timing the collectives in isolation, read how long the compiled
    program REALLY spent in them (reference bracket:
    nbody-par.c:912-918).

    Parses the Chrome-trace json the profiler wrote under ``log_dir``
    (``plugins/profile/*/*.trace.json.gz``), sums complete-event durations
    of leaf XLA op executions, and classifies collectives by HLO name
    (all-gather / collective-permute / all-reduce / reduce-scatter) plus the
    CPU backend's cross-device Rendezvous sync.  Durations aggregate over
    every device lane, so the SHARE is meaningful even though the absolute
    sums exceed wall time.  Returns {"collective_us", "op_us", "share",
    "by_op": {name: us}}.
    """
    import glob
    import gzip
    import json
    import os

    # The profiler writes each run under plugins/profile/<timestamp>/; a
    # reused log_dir accumulates runs, and summing them all would blend
    # different programs into one bogus share.  Read only the NEWEST run;
    # fall back to a recursive glob for hand-laid-out trace dirs.
    run_dirs = [d for d in glob.glob(os.path.join(log_dir, "plugins",
                                                  "profile", "*"))
                if os.path.isdir(d)]
    root = max(run_dirs, key=os.path.getmtime) if run_dirs else log_dir
    files = glob.glob(os.path.join(root, "**", "*.trace.json.gz"),
                      recursive=True)
    if not files:
        raise FileNotFoundError("no *.trace.json.gz under %s" % log_dir)
    coll_us = 0.0
    op_us = 0.0
    by_op: dict = {}
    for path in files:
        with gzip.open(path, "rt") as fh:
            events = json.load(fh).get("traceEvents", [])
        for e in events:
            if e.get("ph") != "X" or "dur" not in e:
                continue
            name = e.get("name", "")
            low = name.lower()
            if any(s in low for s in _TRACE_SCAFFOLD):
                continue
            if any(low.startswith(u) for u in _TRACE_UMBRELLA):
                continue
            op_us += e["dur"]
            if any(c in low for c in _TRACE_COLLECTIVE):
                coll_us += e["dur"]
                key = name.split(".")[0]
                by_op[key] = by_op.get(key, 0.0) + e["dur"]
    return {"collective_us": coll_us, "op_us": op_us,
            "share": coll_us / op_us if op_us else 0.0, "by_op": by_op}


def profile_comm_share(run_fn, state, log_dir: str) -> dict:
    """Trace one execution of a compiled sharded runner and return its
    measured comm share (see ``trace_comm_share``)."""
    with trace(log_dir):
        out = run_fn(state)
        jax.block_until_ready(out)
    return trace_comm_share(log_dir)
