"""Tile autotune for the Pallas force kernel on the real chip.

Sweeps (tile_i, tile_j) for the VMEM-resident kernel and (tile_i, tile_j,
band) for the HBM-streamed kernel at benchmark sizes, reporting pairs/s.
Results inform the defaults in config.SimConfig / ops/pallas_step.py and the
roofline discussion in docs/REPORT.md.

Usage:  python benchmarks/autotune.py [N] [steps]
"""

from __future__ import annotations

import functools
import itertools
import json
import sys
import time

import jax

from parallel_nbody_tpu.config import SimConfig
from parallel_nbody_tpu.models.engine import run
from parallel_nbody_tpu.ops.pallas_step import (_VMEM_RESIDENT_LIMIT,
                                                pallas_block_forces_streamed)
from parallel_nbody_tpu.state import random_state


def time_config(cfg: SimConfig, state, steps: int) -> float:
    """Seconds per step for the fused on-device loop (compile excluded).

    Completion is forced through a host readback of one element: on
    tunneled/async device transports block_until_ready can return before
    the device work is done, producing impossibly fast numbers."""
    out = run(cfg, state, steps)  # compile + warm
    jax.device_get(out.x[:1])
    t0 = time.perf_counter()
    out = run(cfg, state, steps)
    jax.device_get(out.x[:1])
    return (time.perf_counter() - t0) / steps


def time_streamed(cfg: SimConfig, state, steps: int, *, tile_i: int,
                  tile_j: int, band: int) -> float:
    """Seconds per force pass for the HBM-streamed kernel with explicit
    tile/band overrides.  engine.run ignores cfg tiles on the streamed path
    (pallas_forces uses the streamed kernel's own defaults past the VMEM
    limit), so the sweep must call the kernel directly."""
    fn = jax.jit(functools.partial(
        pallas_block_forces_streamed, cfg, tile_i=tile_i, tile_j=tile_j,
        band=band))

    def call():
        return fn(state.x, state.y, state.mass, state.radius,
                  state.x, state.y, state.mass, state.radius)

    fx, _ = call()  # compile + warm
    jax.device_get(fx[:1])
    t0 = time.perf_counter()
    for _ in range(steps):
        fx, _ = call()  # queued dispatches
    jax.device_get(fx[:1])  # one completion fence (readback, see above)
    return (time.perf_counter() - t0) / steps


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 65536
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 30

    base = SimConfig(force_mode="fast", dtype="float32", kernel="pallas")
    state = random_state(n, base, jax.random.PRNGKey(0))
    pairs = n * n  # one-sided kernel evaluates the full matrix
    streamed = n > _VMEM_RESIDENT_LIMIT

    results = []
    if streamed:
        # (tile_i, tile_j, band) sweep of the HBM-streamed kernel
        # (force-only — the integration cost is tile-independent).
        for tile_i, tile_j, band in itertools.product(
                (256, 512, 1024), (512, 1024, 2048), (32768, 65536, 131072)):
            if band % tile_j:
                continue
            try:
                sec = time_streamed(base, state, steps, tile_i=tile_i,
                                    tile_j=tile_j, band=band)
            except Exception as e:
                print(f"tile=({tile_i},{tile_j},band={band})  FAILED: "
                      f"{type(e).__name__}", flush=True)
                continue
            rate = pairs / sec
            results.append({"tile_i": tile_i, "tile_j": tile_j,
                            "band": band, "s_per_step": sec,
                            "pairs_per_s": rate})
            print(f"tile=({tile_i:5d},{tile_j:5d},band={band:6d})  "
                  f"{sec*1e3:8.3f} ms/force  {rate:.3e} pairs/s", flush=True)
    else:
        for tile_i, tile_j in itertools.product((128, 256, 512, 1024),
                                                (512, 1024, 2048, 4096)):
            if tile_i * tile_j * 4 > 8 << 20:  # block too large for VMEM
                continue
            cfg = base.replace(tile_i=tile_i, tile_j=tile_j)
            try:
                sec = time_config(cfg, state, steps)
            except Exception as e:  # Mosaic rejections are data, not failures
                print(f"tile=({tile_i},{tile_j})  FAILED: "
                      f"{type(e).__name__}", flush=True)
                continue
            rate = pairs / sec
            results.append({"tile_i": tile_i, "tile_j": tile_j,
                            "s_per_step": sec, "pairs_per_s": rate})
            print(f"tile=({tile_i:5d},{tile_j:5d})  {sec*1e3:8.3f} ms/step  "
                  f"{rate:.3e} pairs/s", flush=True)

    results.sort(key=lambda r: -r["pairs_per_s"])
    best = results[0] if results else None
    print(json.dumps({"n": n, "kernel": "streamed" if streamed else
                      "resident", "best": best,
                      "device": str(jax.devices()[0])}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
