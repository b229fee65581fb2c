#!/usr/bin/env python
"""Headline benchmark: pairwise interactions/second on one chip.

Runs the flagship fused step (Pallas force kernel + integration, fp32,
transcendental-free) at N=65536 fully on-device and reports unordered
pairwise interactions per second.

Baseline: the reference's best published throughput — N=10000, P=128 cores
on DAS-5 completes 100 steps in 11.23 s (PDF Table 3; BASELINE.md), i.e.
4.45e8 pair interactions/s for the ENTIRE 128-core cluster.  vs_baseline is
our single-chip rate over that cluster-wide rate.

Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""

import json
import os
import subprocess
import sys
import time

import jax
import numpy as np

# Wedged-transport probe budget: the tunneled device backend in some
# environments can hang jax.devices() indefinitely (no CPU burn, no error).
# A hung benchmark records NOTHING; probing in a killable child and retrying
# rides out short wedges and converts a long one into an error JSON line.
# A CRASHED child (bad platform name, broken install) is deterministic —
# it gets one quick retry for transient transport resets, not the full
# wedge budget.
_PROBE_ATTEMPTS = 8
_PROBE_TIMEOUT_S = 90.0
_PROBE_RETRY_SLEEP_S = 75.0
_CRASH_ATTEMPTS = 2
_CRASH_RETRY_SLEEP_S = 5.0


def _backend_responsive(timeout_s=_PROBE_TIMEOUT_S):
    """Return (backend_name, None) if a trivial jit executes, else (None, why).

    why is "timeout" for a killed child (the wedged-transport signature) or
    "crash: <stderr tail>" for a deterministic failure.  Runs in a subprocess
    because a wedged device tunnel hangs inside the platform plugin where no
    Python-level timeout can interrupt it — a child process can simply be
    killed.  The child honors NBODY_PLATFORM / JAX_PLATFORMS via jax.config
    exactly like the parent (cli.py:215-218).
    """
    code = (
        "import os, jax\n"
        "p = os.environ.get('NBODY_PLATFORM') or os.environ.get('JAX_PLATFORMS')\n"
        "if p:\n"
        "    jax.config.update('jax_platforms', p)\n"
        "import numpy as np\n"
        "x = jax.jit(lambda a: a * 2)(np.arange(4, dtype=np.float32))\n"
        "assert float(np.asarray(x)[1]) == 2.0\n"
        "print(jax.default_backend())\n"
    )
    try:
        proc = subprocess.run([sys.executable, "-c", code],
                              capture_output=True, text=True,
                              timeout=timeout_s)
    except subprocess.TimeoutExpired:
        return None, "timeout"
    if proc.returncode != 0 or not proc.stdout.strip():
        tail = (proc.stderr or "").strip().splitlines()
        return None, "crash: " + (tail[-1] if tail else "no stderr")
    return proc.stdout.strip().splitlines()[-1], None


def main():
    # Honor a requested platform before first device use (the env var alone
    # is ignored by some ambient platform plugins; see cli.py:212-218).
    requested = os.environ.get("NBODY_PLATFORM") or os.environ.get("JAX_PLATFORMS")
    if requested:
        jax.config.update("jax_platforms", requested)

    # Per-reason budgets: a late transient crash after timeout attempts
    # still gets its quick retry, and a late wedge after a crash still gets
    # the remaining long-probe budget.
    backend, why = _backend_responsive()
    timeouts = int(why == "timeout")
    crashes = 1 - timeouts if backend is None else 0
    while backend is None:
        if why == "timeout":
            if timeouts >= _PROBE_ATTEMPTS:
                break
            time.sleep(_PROBE_RETRY_SLEEP_S)
        else:
            if crashes >= _CRASH_ATTEMPTS:
                break
            time.sleep(_CRASH_RETRY_SLEEP_S)
        backend, why = _backend_responsive()
        if backend is None:
            timeouts += int(why == "timeout")
            crashes += int(why != "timeout")
    attempts = timeouts + crashes
    if backend is None:
        hint = ("wedged device transport?" if why == "timeout"
                else "deterministic probe failure")
        print(json.dumps({
            "error": "device backend unresponsive after %d probes "
                     "(%s) — %s" % (attempts, why, hint),
        }))
        return 1

    from parallel_nbody_tpu.config import SimConfig
    from parallel_nbody_tpu.models.engine import run
    from parallel_nbody_tpu.state import random_state

    n = 65536
    steps = 100
    # Tiles: benchmarks/autotune.py sweeps force-only rates; on the FULL
    # fused step the (1024, 1024) default measures best (see docs/REPORT.md).
    cfg = SimConfig(force_mode="fast", dtype="float32", kernel="pallas")
    if jax.default_backend() == "cpu":
        # CI/debug fallback: tiny config so the benchmark still runs.
        n, steps = 4096, 10
        cfg = cfg.replace(kernel="xla")
    # Deliberate-slowdown knob for the perf regression gate's sabotage
    # proof (benchmarks/perf_gate.py): force a non-optimal square tile.
    tile = int(os.environ.get("NBODY_BENCH_TILE", "0"))
    if tile and cfg.kernel == "pallas":
        cfg = cfg.replace(tile_i=tile, tile_j=tile)

    state = random_state(n, cfg, jax.random.PRNGKey(0))

    # Warm-up: compile + one full execution (device readback defeats any
    # execution caching between identical dispatches).
    out = run(cfg, state, steps)
    _ = np.asarray(out.x)

    # Best of 5 timed repetitions: the device transport adds run-to-run
    # jitter; the minimum is the cleanest estimate of kernel time.
    rtime = float("inf")
    for _ in range(5):
        t0 = time.time()
        out = run(cfg, out, steps)
        _ = np.asarray(out.x)  # forces completion through the transfer path
        rtime = min(rtime, time.time() - t0)

    if not np.isfinite(np.asarray(out.x)).all():
        print(json.dumps({"error": "non-finite state"}))
        return 1

    pairs = n * (n - 1) // 2 * steps
    rate = pairs / rtime
    baseline_cluster_rate = 4.45e8  # reference best, whole 128-core cluster
    print(json.dumps({
        "metric": f"pairwise interactions/s/chip (N={n}, fused fp32 Pallas step)",
        "value": round(rate, 1),
        "unit": "pairs/s",
        "vs_baseline": round(rate / baseline_cluster_rate, 2),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
