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


# --- Orbax variant: sharded / large-N checkpointing -------------------------
#
# The .npz path above is exact and simple (right for parity-scale runs); for
# production-scale sharded states Orbax writes each device's shards in
# parallel (and across hosts in a multi-process run) without gathering the
# full state to one host.

def save_state_orbax(path: str, state: State, step: int) -> None:
    """Sharding-aware checkpoint: works directly on globally-sharded arrays
    (no host gather).  ``path`` is a directory."""
    import os

    import orbax.checkpoint as ocp

    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(os.path.abspath(path),
                   {"state": state._asdict(), "step": step})


def load_state_orbax(path: str, cfg: SimConfig,
                     sharding=None) -> tuple[State, int]:
    """Restore an Orbax checkpoint; optionally restore arrays directly into
    a target ``NamedSharding`` (resharding on read)."""
    import os

    import jax
    import jax.numpy as jnp
    import orbax.checkpoint as ocp

    with ocp.PyTreeCheckpointer() as ckptr:
        tree = ckptr.restore(os.path.abspath(path))
    dtype = jnp.dtype(cfg.dtype)

    def place(a):
        a = jnp.asarray(a, dtype)
        return jax.device_put(a, sharding) if sharding is not None else a

    state = State(*(place(tree["state"][f]) for f in _FIELDS))
    return state, int(tree["step"])
