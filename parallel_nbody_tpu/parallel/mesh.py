"""Device mesh construction and sharding helpers.

The reference's process topology (MPI ranks launched by prun, block body
decomposition via get_recvcounts/get_displacements/get_bounds,
nbody-par.c:225-263) becomes a 1-D ``jax.sharding.Mesh`` over the body axis.
The remainder-handling recvcounts logic disappears: the body axis is padded to
a shard multiple (``state.pad_state``) so every device owns an equal block —
the XLA-friendly equivalent of variable counts.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

BODY_AXIS = "bodies"


def make_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    """1-D mesh over the body axis.

    On a real TPU slice the devices are ordered so neighboring shards sit on
    ICI neighbors (JAX's default device order for a 1-D mesh follows the
    torus); on CPU this is the virtual-device list.
    """
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        if n_devices > len(devices):
            # The reference's launcher actually allocates the ranks it
            # reports (prun, bin/tests.sh:38); silently truncating here would
            # let callers claim parallelism that never ran.
            raise ValueError(
                "requested a %d-device mesh but only %d device(s) are "
                "available (backend=%s); on a single-host CPU run set "
                "--xla_force_host_platform_device_count" %
                (n_devices, len(devices), jax.default_backend()))
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (BODY_AXIS,))


def body_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(BODY_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_state(state, mesh: Mesh):
    """Place every state array body-sharded on the mesh (the Bcast+scatter
    analog; requires state.n % mesh size == 0 — use pad_state first).

    Works on a multi-process (multi-host) mesh too: every process holds the
    identical full host state (deterministic init — the Bcast analog), and
    each contributes only its addressable shards to the global array."""
    sh = body_sharding(mesh)
    if jax.process_count() > 1:
        def make_global(a):
            a_np = np.asarray(a)
            return jax.make_array_from_callback(
                a_np.shape, sh, lambda idx, a_np=a_np: a_np[idx])
        return jax.tree.map(make_global, state)
    return jax.tree.map(lambda a: jax.device_put(a, sh), state)
