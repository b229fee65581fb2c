"""Price the coincident-pair bias at ring scale (VERDICT r3 #5).

Round 3 asserted the ring path's always-biased cost (~3 %) from a
single-chip N=64K measurement; round 4 both (a) measures it properly at
ring-relevant sizes — this probe — and (b) removed the question's premise by
gating the bias on the ring/grid2d paths too
(ops/pallas_step.any_coincident_tagged, per (own, visiting) block pair).
The probe measures the biased-vs-unbiased delta of the ACTUAL kernel the
ring path runs (the HBM-streamed block kernel; a P-shard ring step is P
block calls of N/P rows x N/P visiting columns) on real hardware:

  - N=1M square block (single-shard ring shape; 1e12 pairs/call)
  - 128K x 128K block   (the per-ring-step block shape of an 8-shard 1M run)
  - N=64K resident-kernel square (the original measurement, re-validated)

Writes benchmarks/ring_bias.json; the decision (dispatch vs document) is
recorded in docs/REPORT.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    import jax
    import numpy as np

    from parallel_nbody_tpu.config import SimConfig
    from parallel_nbody_tpu.ops.pallas_step import (
        pallas_block_forces, pallas_block_forces_streamed)
    from parallel_nbody_tpu.state import random_state

    if jax.default_backend() != "tpu":
        print(json.dumps({"skipped": True, "reason": "requires a real TPU"}))
        return 0

    cfg = SimConfig(force_mode="fast", dtype="float32", kernel="pallas")
    out = {"device": str(jax.devices()[0]), "cases": {}}

    def time_case(label, n_rows, n_cols, kernel, reps):
        st = random_state(max(n_rows, n_cols), cfg, jax.random.PRNGKey(0))
        rows = [a[:n_rows] for a in (st.x, st.y, st.mass, st.radius)]
        cols = [a[:n_cols] for a in (st.x, st.y, st.mass, st.radius)]
        res = {}
        for biased in (True, False):
            @jax.jit
            def forces(r, c, b=biased):
                return kernel(cfg, r[0], r[1], r[2], r[3],
                              c[0], c[1], c[2], c[3],
                              row_g0=0, col_g0=0, biased=b)

            fx, _ = forces(rows, cols)
            _ = np.asarray(fx[:1])  # compile + completion fence
            best = float("inf")
            for _ in range(reps):
                t0 = time.time()
                fx, _ = forces(rows, cols)
                _ = np.asarray(fx[:1])
                best = min(best, time.time() - t0)
            pairs = float(n_rows) * n_cols
            res["biased" if biased else "unbiased"] = {
                "s": round(best, 4), "pairs_per_s": round(pairs / best, 1)}
        res["bias_cost_pct"] = round(
            100.0 * (res["biased"]["s"] / res["unbiased"]["s"] - 1.0), 2)
        out["cases"][label] = res
        print(label, json.dumps(res), flush=True)

    time_case("1M_square_streamed", 1 << 20, 1 << 20,
              pallas_block_forces_streamed, reps=3)
    time_case("128K_block_streamed", 1 << 17, 1 << 17,
              pallas_block_forces_streamed, reps=5)
    time_case("64K_square_resident", 1 << 16, 1 << 16,
              pallas_block_forces, reps=5)

    out["when"] = time.strftime("%Y-%m-%d %H:%M:%S")
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "ring_bias.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
