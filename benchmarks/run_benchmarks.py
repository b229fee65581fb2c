#!/usr/bin/env python
"""Benchmark suite reproducing the shape of the reference's experiment tables
(PDF Tables 1-8; BASELINE.md) plus the TPU-native headline configs
(BASELINE.json configs 2-5).

Usage:
    python benchmarks/run_benchmarks.py [--quick] [--out results.json]

Produces a JSON report with:
  - seq_grid:   runtime/GFLOPS for N in {512,1024,4096,10000} (Table 3 col 1)
  - tpu_grid:   fused-step runtime + pairs/s for N in {4K..1M} on this chip
  - shard_grid: virtual-mesh step timings (allgather vs ring) if >1 device
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from parallel_nbody_tpu.config import SimConfig
from parallel_nbody_tpu.models.engine import run
from parallel_nbody_tpu.state import random_state
from parallel_nbody_tpu.utils.output import nr_flops, pair_interactions


def time_run(cfg, state, steps, chunk=None):
    """Wall-time `steps` fused steps with compile excluded and completion
    forced through a host readback (device-side caching safe).

    ``chunk`` caps steps per dispatch: tunneled device transports kill the
    worker when one dispatch runs for more than ~60 s, so very large N must
    split the loop (each chunk is still one fully-on-device fori_loop)."""
    chunk = chunk or steps
    out = run(cfg, state, chunk)
    if steps % chunk:
        # The loop below ends with a partial chunk — a DIFFERENT jitted
        # program; compile it here (compile ONLY — executing it would queue
        # device work that bleeds into the timed region) or its
        # minutes-scale-at-1M+ compile lands inside the timed region.
        run.lower(cfg, state, steps % chunk).compile()
    _ = np.asarray(out.x)
    t0 = time.time()
    done = 0
    while done < steps:
        k = min(chunk, steps - done)
        out = run(cfg, out, k)
        done += k
    # One completion fence at the end: chunked dispatches queue back-to-back
    # on the device (each stays under the transport's per-dispatch duration
    # limit) without paying a host readback round-trip per chunk.
    _ = np.asarray(out.x)
    return time.time() - t0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "results.json"))
    args = ap.parse_args()

    backend = jax.default_backend()
    report = {"backend": backend, "device": str(jax.devices()[0])}

    # Reference-shaped grid (100 steps, like bin/experiments.sh).
    steps = 10 if args.quick else 100
    seq_grid = {}
    for n in ([512, 1024] if args.quick else [512, 1024, 4096, 10000]):
        cfg = SimConfig(force_mode="fast",
                        dtype="float32" if backend != "cpu" else "float64",
                        kernel="xla")
        st = random_state(n, cfg, jax.random.PRNGKey(0))
        rtime = time_run(cfg, st, steps)
        seq_grid[n] = {
            "steps": steps,
            "rtime_s": round(rtime, 4),
            "gflops": round(nr_flops(n, steps) / 1e9 / rtime, 2),
            "pairs_per_s": round(pair_interactions(n, steps) / rtime, 1),
        }
    report["seq_grid"] = seq_grid

    # TPU-native scaling grid (Pallas fused step).
    if backend != "cpu":
        tpu_grid = {}
        sizes = [4096, 16384] if args.quick else [4096, 16384, 65536,
                                                  262144, 1048576, 2097152]
        for n in sizes:
            cfg = SimConfig(force_mode="fast", dtype="float32",
                            kernel="pallas")
            st = random_state(n, cfg, jax.random.PRNGKey(0))
            # Enough steps that per-dispatch overhead is amortized
            # (~2e11 pair evaluations ~= 2 s of device time per timing),
            # but never more than ~15 s of device time in one dispatch.
            k = max(3, min(200, int(2e11 // (n * n // 2))))
            chunk = max(1, min(k, int(3e12 // (n * n))))
            k = -(-k // chunk) * chunk  # whole chunks: one program, no tail
            rtime = time_run(cfg, st, k, chunk=chunk)
            tpu_grid[n] = {
                "steps": k,
                "ms_per_step": round(rtime / k * 1e3, 3),
                "pairs_per_s": round(pair_interactions(n, k) / rtime, 1),
            }
        report["tpu_grid"] = tpu_grid

    # Sharded grid on whatever mesh is available.
    n_dev = len(jax.devices())
    if n_dev > 1:
        from parallel_nbody_tpu.parallel.mesh import make_mesh, shard_state
        from parallel_nbody_tpu.parallel.sharded_step import make_sharded_run
        from parallel_nbody_tpu.state import pad_state

        shard_grid = {}
        for comm in ("allgather", "ring"):
            cfg = SimConfig(force_mode="fast", dtype="float32", kernel="xla")
            n = 8192
            mesh = make_mesh(n_dev)
            st, _ = pad_state(random_state(n, cfg, jax.random.PRNGKey(0)),
                              n_dev)
            st = shard_state(st, mesh)
            runner = make_sharded_run(cfg, mesh, steps, comm)
            out = runner(st)
            _ = np.asarray(out.x)
            t0 = time.time()
            out = runner(out)
            _ = np.asarray(out.x)
            rtime = time.time() - t0
            shard_grid[comm] = {
                "n": n, "devices": n_dev, "steps": steps,
                "rtime_s": round(rtime, 4),
                "pairs_per_s": round(pair_interactions(n, steps) / rtime, 1),
            }
        report["shard_grid"] = shard_grid

    print(json.dumps(report, indent=2))
    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)


if __name__ == "__main__":
    main()
