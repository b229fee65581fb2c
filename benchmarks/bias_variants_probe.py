"""Perf probe for coincident-bias formulations in the Pallas force kernel.

Round-3 question: the index-bias fix for reference coincident-pair semantics
costs VPU ops in the O(N^2) inner loop.  This probe measures candidate
formulations on the real chip to pick the cheapest correct one:

  r2          round-2 inner loop (NO coincident fix) — the bar to recover
  bias2_max   dx + (bj - bi) per pair, eps via max   (round-3 first cut)
  bias2_fma   dx + (bj - bi) per pair, eps via +eps  (fma-fusable)
  bias_cond   per-tile cond: per-pair bias only on range-overlapping tiles,
              constant signed bias elsewhere, eps via +eps
  bias1_const constant bias everywhere (wrong physics on diagonal tiles —
              pure lower bound for the cond variant)

Usage: python benchmarks/bias_variants_probe.py [N] [steps] [tile_i] [tile_j]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BIAS = 2.0 ** -50
CBIAS = 2.0 ** -26


def make_kernel(variant: str, tile_i: int, tile_j: int, n_cols: int):
    def kernel(xi_ref, yi_ref, mi_ref, ri_ref,
               xj_ref, yj_ref, mj_ref, rj_ref, xf_ref, yf_ref):
        i = pl.program_id(0)
        row0 = i * tile_i
        xi = xi_ref[0, pl.ds(row0, tile_i)].reshape(tile_i, 1)
        yi = yi_ref[0, pl.ds(row0, tile_i)].reshape(tile_i, 1)
        ri = ri_ref[0, pl.ds(row0, tile_i)].reshape(tile_i, 1)
        gi = row0 + lax.broadcasted_iota(jnp.int32, (tile_i, 1), 0)
        bi = gi.astype(jnp.float32) * BIAS

        def col_step(j, acc):
            acc_x, acc_y = acc
            col0 = j * tile_j
            xj = xj_ref[0, pl.ds(col0, tile_j)].reshape(1, tile_j)
            yj = yj_ref[0, pl.ds(col0, tile_j)].reshape(1, tile_j)
            mj = mj_ref[0, pl.ds(col0, tile_j)].reshape(1, tile_j)
            rj = rj_ref[0, pl.ds(col0, tile_j)].reshape(1, tile_j)

            if variant in ("r2", "mxu2_r2"):
                dx = xj - xi
            elif variant in ("bias1_mxu2", "bias1_fma"):
                dx = (xj - xi) + CBIAS
            elif variant in ("bias2_max", "bias2_fma"):
                gj = col0 + lax.broadcasted_iota(jnp.int32, (1, tile_j), 1)
                bj = gj.astype(jnp.float32) * BIAS
                dx = (xj - xi) + (bj - bi)
            elif variant == "bias_cond":
                overlap = (row0 < col0 + tile_j) & (col0 < row0 + tile_i)

                def diag():
                    gj = col0 + lax.broadcasted_iota(jnp.int32, (1, tile_j),
                                                     1)
                    bj = gj.astype(jnp.float32) * BIAS
                    return jnp.broadcast_to(bj - bi, (tile_i, tile_j))

                def offdiag():
                    c = jnp.where(col0 > row0, CBIAS, -CBIAS)
                    return jnp.full((tile_i, tile_j), c, jnp.float32)

                dx = (xj - xi) + lax.cond(overlap, diag, offdiag)
            elif variant == "bias1_const":
                dx = (xj - xi) + CBIAS
            else:
                raise ValueError(variant)

            dy = yj - yi
            dsqr = dx * dx + dy * dy
            mind = ri + rj
            forced = jnp.maximum(dsqr, mind * mind)
            if variant in ("bias2_max", "r2", "mxu2_r2"):
                inv = lax.rsqrt(jnp.maximum(forced * forced * dsqr, 1e-30))
            else:
                inv = lax.rsqrt(forced * forced * dsqr + 1e-36)
            scale = mj * inv
            if variant in ("mxu2_r2", "bias1_mxu2"):
                # Column reduction on the MXU: sum(scale*dx, axis=1) as a
                # matvec against ones (VERDICT r2 #8 experiment).
                ones = jnp.ones((tile_j, 1), jnp.float32)
                px = jnp.dot(scale * dx, ones,
                             preferred_element_type=jnp.float32)
                py = jnp.dot(scale * dy, ones,
                             preferred_element_type=jnp.float32)
                return acc_x + px, acc_y + py
            return (acc_x + jnp.sum(scale * dx, axis=1, keepdims=True),
                    acc_y + jnp.sum(scale * dy, axis=1, keepdims=True))

        zeros = jnp.zeros((tile_i, 1), xi_ref.dtype)
        acc_x, acc_y = lax.fori_loop(0, n_cols // tile_j, col_step,
                                     (zeros, zeros))
        gmi = mi_ref[0, pl.ds(row0, tile_i)].reshape(tile_i, 1) * 1.1
        xf_ref[0, pl.ds(row0, tile_i)] = (acc_x * gmi).reshape(tile_i)
        yf_ref[0, pl.ds(row0, tile_i)] = (acc_y * gmi).reshape(tile_i)

    return kernel


def bench_variant(variant, n, steps, tile_i, tile_j):
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
            return (xf, yf) + a[2:]
        return lax.fori_loop(0, steps, body, args)

    key = jax.random.PRNGKey(0)
    arrs = tuple(jax.random.uniform(k, (1, n), jnp.float32, 1.0, 2.0)
                 for k in jax.random.split(key, 8))
    out = many(arrs)
    jax.device_get(out[0][0, :1])
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = many(arrs)
        jax.device_get(out[0][0, :1])
        best = min(best, (time.perf_counter() - t0) / steps)
    return best


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 65536
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    tile_i = int(sys.argv[3]) if len(sys.argv) > 3 else 1024
    tile_j = int(sys.argv[4]) if len(sys.argv) > 4 else 1024
    base = None
    for variant in ("r2", "bias2_max", "bias2_fma", "bias_cond",
                    "bias1_const", "bias1_fma", "mxu2_r2", "bias1_mxu2"):
        sec = bench_variant(variant, n, steps, tile_i, tile_j)
        rate = n * n / sec
        if base is None:
            base = sec
        print(f"{variant:12s}  {sec*1e3:8.3f} ms/step  {rate:.4e} pairs/s  "
              f"({sec/base*100:5.1f}% of r2)", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
