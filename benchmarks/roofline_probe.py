"""Roofline attribution probe for the Pallas force kernel.

Measures PERF-ONLY ablations of the inner pair loop on the real chip to
attribute time between the rsqrt (transcendental unit), the elementwise VPU
chain, and memory movement.  The ablated kernels compute wrong physics —
they exist purely to locate the bound; results feed docs/REPORT.md.

Usage:  python benchmarks/roofline_probe.py [N] [steps]
"""

from __future__ import annotations

import functools
import sys
import time

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def make_kernel(variant: str, tile_i: int, tile_j: int, n_cols: int):
    def kernel(xi_ref, yi_ref, mi_ref, ri_ref,
               xj_ref, yj_ref, mj_ref, rj_ref, xf_ref, yf_ref):
        i = pl.program_id(0)
        row0 = i * tile_i
        xi = xi_ref[0, pl.ds(row0, tile_i)].reshape(tile_i, 1)
        yi = yi_ref[0, pl.ds(row0, tile_i)].reshape(tile_i, 1)
        ri = ri_ref[0, pl.ds(row0, tile_i)].reshape(tile_i, 1)

        def col_step(j, acc):
            acc_x, acc_y = acc
            col0 = j * tile_j
            xj = xj_ref[0, pl.ds(col0, tile_j)].reshape(1, tile_j)
            yj = yj_ref[0, pl.ds(col0, tile_j)].reshape(1, tile_j)
            mj = mj_ref[0, pl.ds(col0, tile_j)].reshape(1, tile_j)
            rj = rj_ref[0, pl.ds(col0, tile_j)].reshape(1, tile_j)
            dx = xj - xi
            dy = yj - yi
            dsqr = dx * dx + dy * dy
            if variant == "full":
                mind = ri + rj
                forced = jnp.maximum(dsqr, mind * mind)
                inv = lax.rsqrt(jnp.maximum(forced * forced * dsqr, 1e-30))
            elif variant == "no_rsqrt":      # transcendental -> 1 multiply
                mind = ri + rj
                forced = jnp.maximum(dsqr, mind * mind)
                inv = jnp.maximum(forced * forced * dsqr, 1e-30) * 1e-6
            elif variant == "no_soften":     # drop the softening max chain
                inv = lax.rsqrt(jnp.maximum(dsqr * dsqr * dsqr, 1e-30))
            elif variant == "mem_only":      # touch data, minimal math
                inv = dx + dy + mj + rj
            else:
                raise ValueError(variant)
            scale = mj * inv
            return (acc_x + jnp.sum(scale * dx, axis=1, keepdims=True),
                    acc_y + jnp.sum(scale * dy, axis=1, keepdims=True))

        zeros = jnp.zeros((tile_i, 1), xi_ref.dtype)
        acc_x, acc_y = lax.fori_loop(0, n_cols // tile_j, col_step,
                                     (zeros, zeros))
        gmi = mi_ref[0, pl.ds(row0, tile_i)].reshape(tile_i, 1) * 1.1
        xf_ref[0, pl.ds(row0, tile_i)] = (acc_x * gmi).reshape(tile_i)
        yf_ref[0, pl.ds(row0, tile_i)] = (acc_y * gmi).reshape(tile_i)

    return kernel


def bench_variant(variant: str, n: int, steps: int,
                  tile_i: int = 256, tile_j: int = 1024) -> float:
    kernel = make_kernel(variant, tile_i, tile_j, n)
    vec = pl.BlockSpec(memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        kernel, grid=(n // tile_i,), in_specs=[vec] * 8,
        out_specs=(vec, vec),
        out_shape=(jax.ShapeDtypeStruct((1, n), jnp.float32),) * 2)

    @jax.jit
    def many(args):
        def body(_, a):
            xf, yf = call(*a[:8])
            # feed outputs back so steps can't be elided
            return (xf, yf) + a[2:]
        return lax.fori_loop(0, steps, body, args)

    key = jax.random.PRNGKey(0)
    arrs = tuple(jax.random.uniform(k, (1, n), jnp.float32, 1.0, 2.0)
                 for k in jax.random.split(key, 8))
    # Completion forced via a one-element host readback (block_until_ready
    # can return early on tunneled/async device transports).
    out = many(arrs)
    jax.device_get(out[0][0, :1])
    t0 = time.perf_counter()
    out = many(arrs)
    jax.device_get(out[0][0, :1])
    return (time.perf_counter() - t0) / steps


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 65536
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    base = None
    for variant in ("full", "no_rsqrt", "no_soften", "mem_only"):
        sec = bench_variant(variant, n, steps)
        rate = n * n / sec
        if base is None:
            base = sec
        print(f"{variant:10s}  {sec*1e3:8.3f} ms/step  {rate:.3e} pairs/s  "
              f"({sec/base*100:5.1f}% of full)", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
