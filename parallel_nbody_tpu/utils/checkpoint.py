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

def save_state_orbax(path: str, state: State, step: int,
                     n_real: int | None = None) -> None:
    """Sharding-aware checkpoint: works directly on globally-sharded arrays
    (no host gather — each process writes only its addressable shards, the
    contrast to the reference's rank-0-assembles-everything final state,
    nbody-par.c:913-944).  ``path`` is a directory.  ``n_real`` records the
    unpadded body count when ``state`` carries sharding padding.

    In a multi-process run this is a COLLECTIVE: every process must call it.
    """
    import os

    import orbax.checkpoint as ocp

    if os.path.exists(path) and not os.path.isdir(path):
        # Orbax's force=True save REPLACES whatever sits at the target path
        # — handed an existing regular file (say the arena PPM), it would
        # silently delete it and write a directory in its place.  Only a
        # directory (a previous checkpoint) is a legitimate overwrite
        # target; anything else is almost certainly a user mistake.
        raise ValueError(
            "refusing to replace existing non-directory file with an Orbax "
            "checkpoint directory (use a .npz suffix for a single-file "
            "snapshot)")
    with ocp.PyTreeCheckpointer() as ckptr:
        # force: overwrite an existing checkpoint at the same path, matching
        # the .npz path's re-run semantics (np.savez silently overwrites).
        ckptr.save(os.path.abspath(path),
                   {"state": state._asdict(), "step": step,
                    "n_real": int(state.n if n_real is None else n_real)},
                   force=True)


def orbax_metadata_tree(path: str):
    """The saved tree's metadata (shapes/keys, nothing restored).

    Raises ``ValueError`` when ``path`` is not an Orbax checkpoint
    directory, so CLI callers surface a friendly error instead of an
    AttributeError from Orbax internals."""
    import os

    import orbax.checkpoint as ocp

    with ocp.PyTreeCheckpointer() as ckptr:
        meta = ckptr.metadata(os.path.abspath(path))
    item = getattr(meta, "item_metadata", None)
    tree = getattr(item, "tree", None)
    if not tree or "state" not in tree:
        raise ValueError("not an Orbax checkpoint directory")
    return tree


def orbax_saved_length(path: str, meta_tree=None) -> int:
    """Body-axis length of the arrays stored in an Orbax checkpoint
    (padding included), read from metadata without restoring anything."""
    tree = meta_tree if meta_tree is not None else orbax_metadata_tree(path)
    return int(tree["state"]["x"].shape[0])


def load_state_orbax(path: str, cfg: SimConfig, sharding=None,
                     meta_tree=None) -> tuple[State, int, int | None]:
    """Restore an Orbax checkpoint -> (state, step, n_real).

    With ``sharding`` (a ``NamedSharding``), every array is restored
    DIRECTLY into that sharding — each process reads only the shards it
    addresses, so resuming a sharded run never materializes the full state
    on one host (resharding across different mesh sizes happens on read).
    Without it, plain host arrays are returned.

    ``n_real`` is ``None`` for checkpoints written before the key existed —
    callers that know the body count from elsewhere (the CLI's argv) can
    still unpad and resume them.  ``meta_tree`` (from
    ``orbax_metadata_tree``) avoids a second metadata read.
    """
    import os

    import jax.numpy as jnp
    import orbax.checkpoint as ocp

    dtype = jnp.dtype(cfg.dtype)
    # restore_args must mirror the SAVED tree exactly — build the scalar
    # entries from the checkpoint's own metadata so older checkpoints
    # (saved without "n_real") stay resumable.
    meta = meta_tree if meta_tree is not None else orbax_metadata_tree(path)
    restore_args = {k: ocp.RestoreArgs() for k in meta if k != "state"}
    with ocp.PyTreeCheckpointer() as ckptr:
        if sharding is None:
            # Explicit host-numpy restore: without restore_args Orbax falls
            # back to a default that warns "restoring without sharding info
            # ... unsafe when restoring on a different topology".  Plain
            # numpy IS the intent here (the caller re-shards afterwards), so
            # say so rather than lean on the unsafe default.
            restore_args["state"] = {
                f: ocp.RestoreArgs(restore_type=np.ndarray)
                for f in meta["state"]}
            tree = ckptr.restore(os.path.abspath(path),
                                 restore_args=restore_args)
            state = State(*(jnp.asarray(tree["state"][f], dtype)
                            for f in _FIELDS))
        else:
            restore_args["state"] = {
                f: ocp.ArrayRestoreArgs(sharding=sharding, dtype=dtype)
                for f in _FIELDS}
            tree = ckptr.restore(os.path.abspath(path),
                                 restore_args=restore_args)
            state = State(*(tree["state"][f] for f in _FIELDS))
    n_real = int(tree["n_real"]) if "n_real" in tree else None
    return state, int(tree["step"]), n_real
