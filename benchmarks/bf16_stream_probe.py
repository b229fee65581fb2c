"""Does bf16 storage actually buy bandwidth where it should?  (round 5)

The dtype matrix (docs/DESIGN.md) claims bf16 is a STORAGE format whose
payoff is HBM traffic, not arithmetic: the Pallas kernels compute fp32
regardless (ops/pallas_step.py::_compute_dtype), so at VMEM-resident N the
step time is fp32-parity (measured 21.0 vs 21.1 ms/step at N=64K,
drift_study.json).  This probe measures the claim's OTHER half on the
HBM-streaming kernel, whose column bands are re-read from HBM for every
row tile: at N=1M the force pass streams ~N/tile_i x 4 x N x itemsize
bytes, so halving the element size should show up directly.

Protocol mirrors benchmarks/ring_bias_probe.py: jit-wrapped force pass,
warm-up dispatch, best of 3 timed repetitions, completion forced through a
host readback (block_until_ready returns early on the tunneled transport).
Writes benchmarks/bf16_stream_probe.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = 1 << 20  # 1M bodies: firmly past the 128K VMEM-resident limit
REPS = 3
OUT_JSON = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "bf16_stream_probe.json")


def main() -> int:
    import jax
    import numpy as np

    from parallel_nbody_tpu.config import SimConfig
    from parallel_nbody_tpu.ops.pallas_step import pallas_forces
    from parallel_nbody_tpu.state import random_state

    if jax.default_backend() != "tpu":
        print(json.dumps({"skipped": True,
                          "reason": "requires a real TPU"}))
        return 0

    result = {"n": N, "reps": REPS, "device": str(jax.devices()[0]),
              "modes": {}}
    for dtype in ("float32", "bfloat16"):
        cfg = SimConfig(force_mode="fast", dtype=dtype, kernel="pallas")
        st = random_state(N, cfg, jax.random.PRNGKey(0))

        @jax.jit
        def forces(s, c=cfg):
            return pallas_forces(c, s.x, s.y, s.mass, s.radius)

        fx, fy = forces(st)  # compile + warm
        _ = np.asarray(fx[:1], np.float32)
        best = float("inf")
        for _ in range(REPS):
            t0 = time.time()
            fx, fy = forces(st)
            _ = np.asarray(fx[:1], np.float32)  # completion fence
            best = min(best, time.time() - t0)
        assert np.isfinite(np.asarray(fx, np.float32)).all()
        result["modes"][dtype] = {"force_pass_s": best,
                                  "pairs_per_s": N * (N - 1) / 2 / best}
        print("%s: %.3f s (%.3e pairs/s)"
              % (dtype, best, result["modes"][dtype]["pairs_per_s"]),
              flush=True)

    f32 = result["modes"]["float32"]["force_pass_s"]
    b16 = result["modes"]["bfloat16"]["force_pass_s"]
    result["bf16_speedup"] = f32 / b16
    result["when"] = time.strftime("%Y-%m-%d %H:%M:%S")
    with open(OUT_JSON, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
