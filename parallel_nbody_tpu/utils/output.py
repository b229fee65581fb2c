"""Output contract of the reference programs.

``print`` (nbody-seq.c:356-365) emits one line per body:
``"%10.3f %10.3f %10.3f %10.3f %10.3f %10.3f\n"`` of
(x, y, xf, yf, xv, yv) — final positions/velocities, last step's forces.
The experiment CSV (``--run-xps``) formats follow nbody-seq.c:488 and
nbody-par.c:954-957.
"""

from __future__ import annotations

import numpy as np

from ..state import State

_LINE = "%10.3f %10.3f %10.3f %10.3f %10.3f %10.3f"


def format_state(state: State) -> str:
    """Byte-identical rendering of the reference's final-state printout.

    Uses the native snprintf formatter when built — it INHERITS the
    reference's printf rounding/width semantics instead of re-implementing
    them (speed is a wash; snprintf dominates both paths).  The Python %
    formatting below is the verified byte-identical fallback."""
    x = np.asarray(state.x, np.float64)
    y = np.asarray(state.y, np.float64)
    xf = np.asarray(state.xf, np.float64)
    yf = np.asarray(state.yf, np.float64)
    xv = np.asarray(state.xv, np.float64)
    yv = np.asarray(state.yv, np.float64)

    from . import native_bridge
    native = native_bridge.format_state_native(x, y, xf, yf, xv, yv)
    if native is not None:
        return native

    lines = [
        _LINE % (x[b], y[b], xf[b], yf[b], xv[b], yv[b])
        for b in range(x.shape[0])
    ]
    return "\n".join(lines) + "\n"


def nr_flops(n: int, steps: int) -> int:
    """The reference's analytic FLOP model (nbody-seq.c:367-380)."""
    per_step = 20 * (n * (n - 1) // 2) + 18 * n + 4 * n
    return per_step * steps


def pair_interactions(n: int, steps: int) -> int:
    """Unordered pairwise interactions evaluated (the benchmark currency)."""
    return steps * n * (n - 1) // 2


def xps_csv_seq(n: int, rtime: float, gflops: float) -> str:
    """Sequential experiment CSV row (nbody-seq.c:488): NBODIES,RTIME,GFLOPS."""
    return "%d,%.3f, %.2f" % (n, rtime, gflops)


def xps_csv_par(size: int, nodes: int, cpus_per_node: int, n: int,
                rtime: float, comm_time: float, gflops: float,
                precise: bool = False) -> str:
    """Parallel experiment CSV row, byte-matching the reference contract
    (nbody-par.c:956): ``"%d,%d,%d,%d,%.3f,%.3f,%.3f,%.2f"`` for
    SIZE,NODES,CPUS_PER_NODE,NBODIES,RTIME,COMMTIME,RATIO,GFLOPS (note: no
    space before GFLOPS — only the SEQ row has one, nbody-seq.c:488).

    ``precise=True`` (CLI ``--xps-precise``) widens COMMTIME/RATIO to 6
    decimals: per-step collectives on fast interconnects are well under a
    millisecond, and the comm-share analysis (reference PDF Tables 4/8)
    needs them distinguishable from zero.  This deliberately deviates from
    the reference byte contract, which is why it is opt-in."""
    ratio = comm_time / rtime if rtime > 0 else 0.0
    fmt = ("%d,%d,%d,%d,%.3f,%.6f,%.6f,%.2f" if precise
           else "%d,%d,%d,%d,%.3f,%.3f,%.3f,%.2f")
    return fmt % (size, nodes, cpus_per_node, n, rtime, comm_time, ratio,
                  gflops)
