"""Multi-host launch path, actually executed: two local processes join a
gloo-backed ``jax.distributed`` runtime (2 x 2 virtual CPU devices), build
the global body mesh, run the real sharded step (allgather + ring) on
globally-sharded arrays, and verify every addressable shard against the
single-device oracle.  The reference's analog is the prun multi-node launch
(/root/reference/bin/tests.sh:38)."""

import os
import socket
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_distributed_sharded_step():
    port = _free_port()
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("JAX_PLATFORMS", None)  # the worker forces its own platform

    procs = [
        subprocess.Popen(
            [sys.executable, "-m",
             "parallel_nbody_tpu.parallel.multihost_smoke",
             str(pid), "2", str(port)],
            cwd=REPO, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=300)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, (
            "worker %d failed:\n%s" % (pid, out[-4000:]))
        assert "MULTIHOST_OK" in out, out[-2000:]
