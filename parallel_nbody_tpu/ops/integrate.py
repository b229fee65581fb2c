"""Velocity / position update (semi-implicit order) with friction and wall
bounce.

Reference semantics:
  - compute_velocities (nbody-seq.c:114-130): speed-proportional drag
    ``|v| * FRICTION`` applied opposite ``atan2(yv, xv)``, then
    ``v += (f / m) * dt``.
  - compute_positions (nbody-seq.c:135-165): ``x_new = x + v_new * dt`` using
    the JUST-updated velocity; wall bounce clamps to ``0`` (low) or
    ``dim - 1`` (high, asymmetric!) and negates the velocity component.

``mode="trig"`` keeps the reference's ``cos(atan2(yv, xv))`` drag projection
for bit-parity.  ``mode="fast"`` uses the identity
``|v| * cos(atan2(yv, xv)) == xv`` so drag is simply ``FRICTION * v`` —
algebraically identical and transcendental-free.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..config import SimConfig


def compute_velocities(cfg: SimConfig, xv, yv, xf, yf, mass):
    if cfg.force_mode == "trig":
        speed = jnp.sqrt(xv * xv + yv * yv) * cfg.friction
        angle = jnp.arctan2(yv, xv)
        fx = xf - speed * jnp.cos(angle)
        fy = yf - speed * jnp.sin(angle)
    else:
        fx = xf - cfg.friction * xv
        fy = yf - cfg.friction * yv
    # Zero-mass padding bodies (pad_state) must stay inert: guard the 1/m.
    inv_m = jnp.where(mass > 0, 1.0 / mass, jnp.zeros((), xv.dtype))
    return xv + fx * inv_m * cfg.dt, yv + fy * inv_m * cfg.dt


def compute_positions(cfg: SimConfig, x, y, xv, yv, mass=None):
    """Returns (x_new, y_new, xv_new, yv_new) after the wall bounce.

    Pass ``mass`` on PADDED states (pad_state): zero-mass padding rows are
    frozen in place.  Without it the wall clamp would drag the far-away
    padding (parked at 1e9 so it can never couple to real bodies) into the
    arena corner on the first step — physically harmless (padding is
    massless), but it breaks the documented stays-far-outside invariant and
    can make a real body that bounces into the exact corner pixel
    position-coincident with padding.  For unpadded states the extra select
    is a no-op (every mass > 0) and bit-parity is unaffected.
    """
    dtype = x.dtype
    xn = x + xv * cfg.dt
    yn = y + yv * cfg.dt

    lo_x = xn < 0
    hi_x = xn >= cfg.xdim
    xn = jnp.where(lo_x, jnp.zeros((), dtype),
                   jnp.where(hi_x, jnp.asarray(cfg.xdim - 1, dtype), xn))
    xvn = jnp.where(lo_x | hi_x, -xv, xv)

    lo_y = yn < 0
    hi_y = yn >= cfg.ydim
    yn = jnp.where(lo_y, jnp.zeros((), dtype),
                   jnp.where(hi_y, jnp.asarray(cfg.ydim - 1, dtype), yn))
    yvn = jnp.where(lo_y | hi_y, -yv, yv)

    if mass is not None:
        real = mass > 0
        xn = jnp.where(real, xn, x)
        yn = jnp.where(real, yn, y)
        xvn = jnp.where(real, xvn, xv)
        yvn = jnp.where(real, yvn, yv)

    return xn, yn, xvn, yvn
