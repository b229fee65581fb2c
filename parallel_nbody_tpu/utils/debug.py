"""Debug / validation utilities.

The reference has no sanitizers (SURVEY.md §5 — only -Wall and a comment
documenting an OpenMP hazard).  Under XLA there are no data races to detect;
the failure modes are numerical (NaN/Inf from bad softening or overflow) and
shape/sharding bugs.  This module provides the NaN-check debug mode the
survey calls for.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..state import State


def enable_nan_checks() -> None:
    """Turn on jax's global NaN debugging (checks every primitive output;
    slow — debug mode only).  CLI flag: --check-nans."""
    jax.config.update("jax_debug_nans", True)


@dataclasses.dataclass
class StateDiagnostics:
    n: int
    finite: bool
    nan_fields: list[str]
    pos_in_bounds: bool
    max_speed: float
    max_force: float

    def ok(self) -> bool:
        return self.finite


def _format_pair(a, b) -> str:
    """Two-column %10.3f rendering shared by the per-field printers."""
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    return "".join("%10.3f %10.3f\n" % (a[i], b[i]) for i in range(a.shape[0]))


def format_forces(state: State) -> str:
    """Per-body force printout (reference print_forces, nbody-par.c:708-717)."""
    return _format_pair(state.xf, state.yf)


def format_velocities(state: State) -> str:
    """Per-body velocity printout (reference print_velocities,
    nbody-par.c:719-728)."""
    return _format_pair(state.xv, state.yv)


def format_positions(state: State) -> str:
    """Per-body position printout (reference print_positions,
    nbody-par.c:730-739)."""
    return _format_pair(state.x, state.y)


def validate_state(state: State, xdim: int | None = None,
                   ydim: int | None = None) -> StateDiagnostics:
    """Host-side state validation (finiteness, bounds, magnitudes)."""
    nan_fields = []
    for name, arr in zip(State._fields, state):
        if not bool(jnp.isfinite(arr).all()):
            nan_fields.append(name)
    x = np.asarray(state.x)
    y = np.asarray(state.y)
    in_bounds = True
    if xdim is not None:
        # Legal positions occupy [0, dim): the wall bounce clamps to dim-1
        # only once x_new >= dim (compute_positions), so e.g. x = xdim-0.5
        # is a healthy in-bounds state.
        in_bounds = bool((x >= 0).all() and (x < xdim).all()
                         and (y >= 0).all() and (y < ydim).all())
    speed = np.sqrt(np.asarray(state.xv) ** 2 + np.asarray(state.yv) ** 2)
    force = np.sqrt(np.asarray(state.xf) ** 2 + np.asarray(state.yf) ** 2)
    return StateDiagnostics(
        n=state.n,
        finite=not nan_fields,
        nan_fields=nan_fields,
        pos_in_bounds=in_bounds,
        max_speed=float(speed.max()) if speed.size else 0.0,
        max_force=float(force.max()) if force.size else 0.0,
    )
