"""On-device PPM rasterizer.

Reference semantics (display, nbody-seq.c:326-354): for every pixel, linear-
scan bodies in index order; the FIRST body whose center is within
``radius + 0.5`` of the pixel wins; its color is a 12-bit tint
``(0xfff * (b+1)) / (bodyCt+2)`` unpacked into RGB nibbles
(color/black, nbody-seq.c:307-324).  O(W*H*N) serial scan.

TPU-native design: "first body in index order" == "minimum body index among
hits", which vectorizes as a min-index reduction over body chunks — the same
pixels, computed as a data-parallel reduction instead of a pixel loop.  Rows
are processed in blocks so the (body_chunk x rows x W) hit tensor stays small
enough for VMEM-friendly fusion at any N.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

from ..config import SimConfig

_NO_HIT = jnp.iinfo(jnp.int32).max


def _min_hit_index_rows(x, y, radius, ys, width):
    """Minimum hitting body index for a block of pixel rows.

    x/y/radius: (B,) body data (padding bodies must have radius < -0.5 so
    they can never hit).  ys: (R,) row coordinates.  Returns (R, W) int32.
    """
    dtype = x.dtype
    px = lax.broadcasted_iota(dtype, (1, 1, width), 2)
    py = ys.astype(dtype)[None, :, None]
    dx = x[:, None, None] - px
    dy = y[:, None, None] - py
    d = jnp.sqrt(dx * dx + dy * dy)
    hit = d <= (radius[:, None, None] + 0.5)
    n = x.shape[0]
    bidx = lax.broadcasted_iota(jnp.int32, (n, 1, 1), 0)
    idx = jnp.where(hit, bidx, _NO_HIT)
    return jnp.min(idx, axis=0)


@functools.partial(jax.jit, static_argnums=(0, 4, 5))
def render_frame(cfg: SimConfig, x, y, radius, n_real: int,
                 row_block: int = 32):
    """Rasterize body positions into an (ydim, xdim, 3) uint8 frame.

    Pixel-identical to the reference's display() (modulo sqrt rounding at
    exact hit boundaries).  ``n_real`` masks trailing padding bodies.
    """
    h, w = cfg.ydim, cfg.xdim
    n = x.shape[0]
    dtype = x.dtype
    # Disable padding bodies: radius -1 never satisfies d <= r + 0.5.
    if n_real < n:
        real = jnp.arange(n) < n_real
        radius = jnp.where(real, radius, jnp.asarray(-1.0, dtype))

    nblocks = -(-h // row_block)

    def block(i):
        ys = i * row_block + jnp.arange(row_block)
        return _min_hit_index_rows(x, y, radius, ys, w)

    best = lax.map(block, jnp.arange(nblocks)).reshape(nblocks * row_block, w)
    best = best[:h]

    # 12-bit tint unpacked into RGB nibbles (nbody-seq.c:307-316).
    tint = (0xFFF * (best + 1)) // (n_real + 2)
    red = (tint & 0xF) << 4
    green = tint & 0xF0
    blue = (tint & 0xF00) >> 4
    rgb = jnp.stack([red, green, blue], axis=-1).astype(jnp.uint8)
    miss = (best == _NO_HIT)[..., None]
    return jnp.where(miss, jnp.zeros((), jnp.uint8), rgb)
