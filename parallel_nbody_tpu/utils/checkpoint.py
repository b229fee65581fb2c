"""Checkpoint / resume (.npz state snapshots).

The reference has none (SURVEY.md §5) — its only persistence is the final
stdout dump.  This adds simple, exact state save/restore: positions,
velocities, forces, masses, radii and the step counter, stored as float64 so
a resumed parity run stays byte-clean.
"""

from __future__ import annotations

import numpy as np

from ..config import SimConfig
from ..state import State

_FIELDS = ("x", "y", "xv", "yv", "xf", "yf", "mass", "radius")


def save_state(path: str, state: State, step: int) -> None:
    arrays = {f: np.asarray(getattr(state, f), np.float64) for f in _FIELDS}
    np.savez(path, step=np.int64(step), **arrays)


def load_state(path: str, cfg: SimConfig) -> tuple[State, int]:
    import jax.numpy as jnp

    with np.load(path) as z:
        dtype = jnp.dtype(cfg.dtype)
        state = State(*(jnp.asarray(z[f], dtype) for f in _FIELDS))
        return state, int(z["step"])
