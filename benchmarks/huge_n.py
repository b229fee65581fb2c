"""N=10M demonstration on ONE chip (BASELINE.json config 5's scale, minus
the multi-host part): one full simulation step — HBM-streamed Pallas forces
over all 1e14 body pairs, velocity+position integration — plus an on-TPU
rasterized PPM frame of the result.

The force pass is host-chunked over row blocks because the tunneled device
transport in this environment kills any single dispatch running >~60 s
(each chunk is ~26 s of device time); on directly-attached hardware the
whole step is one dispatch.  The rasterizer is likewise banded over pixel
rows.  Everything stays on-device between dispatches.

Usage: python benchmarks/huge_n.py [N] [row_chunk] [out.ppm]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from parallel_nbody_tpu.config import SimConfig
from parallel_nbody_tpu.ops.integrate import (compute_positions,
                                              compute_velocities)
from parallel_nbody_tpu.ops.pallas_step import (any_coincident,
                                                pallas_block_forces_streamed)
from parallel_nbody_tpu.ops.render import render_frame_hosted
from parallel_nbody_tpu.state import random_state
from parallel_nbody_tpu.utils import ppm


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    row_chunk = int(sys.argv[2]) if len(sys.argv) > 2 else 500_000
    out_ppm = sys.argv[3] if len(sys.argv) > 3 else "/tmp/nbody_10m.ppm"

    cfg = SimConfig(force_mode="fast", dtype="float32", kernel="pallas")
    t0 = time.time()
    st = random_state(n, cfg, jax.random.PRNGKey(0))
    jax.device_get(st.x[:1])
    t_init = time.time() - t0

    # Positions are fixed for the whole force pass, so the exact
    # coincident-pair test (engine.step's per-step dispatch) runs ONCE here
    # and selects the kernel statically for every row chunk.
    biased = bool(any_coincident(st.x, st.y, st.mass))

    @jax.jit
    def force_rows(x, y, m, r, r0):
        xi = jax.lax.dynamic_slice_in_dim(x, r0, row_chunk)
        yi = jax.lax.dynamic_slice_in_dim(y, r0, row_chunk)
        mi = jax.lax.dynamic_slice_in_dim(m, r0, row_chunk)
        ri = jax.lax.dynamic_slice_in_dim(r, r0, row_chunk)
        # row_g0 keeps the biased kernel's overlap segment (self-pair and
        # coincident handling) aligned with the rows' true global indices.
        return pallas_block_forces_streamed(cfg, xi, yi, mi, ri, x, y, m, r,
                                            row_g0=r0, col_g0=0,
                                            biased=biased)

    @jax.jit
    def integrate(x, y, xv, yv, xf, yf, m):
        xv, yv = compute_velocities(cfg, xv, yv, xf, yf, m)
        return compute_positions(cfg, x, y, xv, yv)

    assert n % row_chunk == 0, "row_chunk must divide N for this demo"
    n_chunks = n // row_chunk
    t0 = time.time()
    fxs, fys = [], []
    for c in range(n_chunks):
        fx, fy = force_rows(st.x, st.y, st.mass, st.radius, c * row_chunk)
        jax.device_get(fx[:1])  # completion fence per dispatch
        fxs.append(fx)
        fys.append(fy)
        print("  chunk %d/%d  (%.1f s elapsed)"
              % (c + 1, n_chunks, time.time() - t0), flush=True)
    xf = jnp.concatenate(fxs)
    yf = jnp.concatenate(fys)
    x, y, xv, yv = integrate(st.x, st.y, st.xv, st.yv, xf, yf, st.mass)
    jax.device_get(x[:1])
    t_step = time.time() - t0

    # On-TPU raster of the stepped state via the SHARED chunked min-index
    # helpers (ops/render.py): bodies are chunked and the per-chunk min-index
    # results merged — earlier chunks hold smaller global indices, so an
    # elementwise min preserves the reference's first-hit-by-index semantics
    # exactly.  Host-chunked (rather than render_frame's on-device
    # body_chunk loop) only because of this environment's ~60 s dispatch
    # limit; each chunk stays one fused reduction on-device.
    t0 = time.time()
    body_chunk = 250_000
    n_render_chunks = -(-n // body_chunk)
    done = [0]

    def fence(sub):
        # Per-dispatch completion + progress; the shared helper clamps the
        # tail chunk (k = min(body_chunk, n - b0)) so a non-multiple N
        # rasterizes every body under its true global index.
        jax.device_get(sub[:1, :1])
        done[0] += 1
        if done[0] % 10 == 0 or done[0] == n_render_chunks:
            print("  render %d/%d (%.1f s elapsed)"
                  % (done[0], n_render_chunks, time.time() - t0), flush=True)

    frame = render_frame_hosted(cfg, x, y, st.radius, n,
                                body_chunk=body_chunk, fence=fence)
    ppm.create(out_ppm, cfg.xdim, cfg.ydim, frame)
    t_render = time.time() - t0

    pairs = float(n) * n  # one-sided
    result = {
        "n": n,
        "init_s": round(t_init, 1),
        "step_s": round(t_step, 1),
        "one_sided_pairs_per_s": round(pairs / t_step, 1),
        "unordered_pairs_per_s": round(pairs / 2 / t_step, 1),
        "render_s": round(t_render, 1),
        "frame": out_ppm,
        "row_chunk": row_chunk,
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(result))
    out_json = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "results_huge.json")
    with open(out_json, "w") as f:
        json.dump(result, f, indent=2)
    return 0


if __name__ == "__main__":
    sys.exit(main())
