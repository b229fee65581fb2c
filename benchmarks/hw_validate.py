"""On-hardware correctness gate for the Pallas TPU kernels (VERDICT r3 #1).

Every byte/tolerance assertion in tests/ runs the Pallas kernels in INTERPRET
mode on CPU; this script closes the one untested link by asserting the REAL
Mosaic-compiled kernels against the CPU fp64 oracle:

  case A  resident kernel  — N=4096 glibc init (contains coincident pairs,
          so the runtime biased/unbiased dispatch and the dx-bias kick are
          both exercised), 20 fused fp32 steps, positions/velocities vs the
          fp64 oracle trajectory.
  case B  streamed kernel  — same trajectory but with the HBM-streaming
          grid-pipelined kernel forced at band=1024 (4 bands: the
          revisited-output accumulation across bands is exercised, not just
          the single-band degenerate shape).
  case C  streamed at scale — N=262144 (past the VMEM-resident limit, real
          glibc init, heavily coincident): the force OPERATOR is validated
          row-wise against a CPU fp64 oracle at step 0 AND on the state the
          hardware evolved for 20 steps.  (A full 20-step fp64 trajectory
          oracle at N=262144 is ~1.4e12 pair evaluations — ~2 h on this
          box's one core — so the gate checks the operator on both endpoint
          states instead; the integration ops are shared with case A where
          the full trajectory IS checked.)
  case F  compensated accumulation — case A rerun with
          ``accum="compensated"`` (the Kahan option, BASELINE config 3):
          the compensated Mosaic kernels must meet the same tolerances.
  case B' streamed x compensated — case B's band=1024 streamed trajectory
          rerun with ``accum="compensated"``, so the CROSS-BAND Kahan folds
          through VMEM scratch (ops/pallas_step.py, streamed revisited-output
          reduction) compile and run under real Mosaic: B exercises streamed
          plain, F exercises resident compensated, and this case closes
          their composition (the one kernel path round 4 left
          interpret-only).
  random  seeded micro-fuzz — RANDOM_COUNT configs drawn from
          random.Random(RANDOM_SEED): N in [1024, 8192], steps in [5, 30],
          variant in {resident, streamed}, accum in {plain, compensated},
          each trajectory checked against its own CPU fp64 oracle.  The
          velocity quantile gate uses p90 here (not A/B's p99): a glibc
          integer-pixel init carries ~N^2/(2*xdim*ydim) coincident pairs
          whose members intrinsically diverge ~3e-3 (see the tolerance
          notes below), and at N=8192 that population (~80 bodies) reaches
          the p99 rank while staying far under p90's ~820.
  case D  ring program    — the full ppermute + per-block coincidence
          dispatch program (make_sharded_run, comm="ring") on a single-chip
          mesh at N=262144, 20 steps, compared on-device against the fused
          engine's trajectory (case C's endpoint).  Round-4's one-off check
          found bit-identity at 3 steps; this makes it a standing gate.
          (case D' is the same comparison on the allgather program.)
  case E  grid2d program  — the 2-D force-matrix decomposition
          (make_grid2d_run, degenerate 1x1 mesh: row/col gathers + psum)
          at N=262144, 20 steps, same comparison.
  sabotage — case A rerun with gravity sign-flipped must FAIL the same
          tolerances, proving the gate can detect a broken kernel.

Run on a machine with a real TPU:

    python benchmarks/hw_validate.py            # full gate
    python benchmarks/hw_validate.py --oracle F # (internal) CPU oracle phase

The TPU phase (fp32, x32 disabled) dumps device outputs to an .npz; the CPU
oracle phase runs in a SUBPROCESS with float64 enabled (the two phases need
different x64 settings, which are process-global).  Verdict JSON is written
to benchmarks/hw_validate.json.

Reference bar: every configuration the reference ships is golden-diff
validated (/root/reference/bin/tests.sh:38-44); this makes the TPU-hardware
configuration no longer the exception.
"""

from __future__ import annotations

import json
import os
import random
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_SMALL = 4096
N_LARGE = 262144
STEPS = 20
ROWS_CHECKED = 4096  # leading rows of case C validated against the oracle
ORACLE_ROW_CHUNK = 512

# Seeded random micro-fuzz (VERDICT r4 #6).  Seed 1 was chosen so the three
# draws cover both variants AND both accum modes (checked at selection time;
# any change here should re-check that coverage).
RANDOM_SEED = 1
RANDOM_COUNT = 3


def random_case_specs():
    """The seeded random configs, identical in both phases (the draw order
    is load-bearing: hardware and oracle must agree on what R{i} means)."""
    rng = random.Random(RANDOM_SEED)
    specs = []
    for _ in range(RANDOM_COUNT):
        specs.append({"n": rng.randint(1024, 8192),
                      "steps": rng.randint(5, 30),
                      "variant": rng.choice(["resident", "streamed"]),
                      "accum": rng.choice(["plain", "compensated"])})
    return specs

# Tolerances (fp32 kernels vs fp64 oracle; thresholds sit ~10x above the
# observed maxima recorded in hw_validate.json, far below any semantic bug):
#   positions: absolute (values are O(1000); observed max 5.0e-4)
#   velocities: TWO-TIER relative (+1 floor).  The glibc init's coincident
#     pairs separate at slightly different steps in fp32 vs fp64 (the kick
#     displacement is below one fp32 position ulp for a step or two), so the
#     handful of pair members carry an intrinsic ~3e-3 divergence — measured
#     identical across the resident and streamed kernels, and confirmed to
#     affect ONLY coincident-pair bodies (p99 over all bodies is 8.9e-7).
#     Hence: p99 must be tight (catches any broad kernel error), max merely
#     bounded (catches per-body blowups; the gravity-flip sabotage measures
#     0.162, 16x over).
#   forces: relative (+1 floor; observed max 3.5e-5 at N=262144).
TOL_POS = 2e-2
TOL_VEL_P99 = 1e-5
TOL_VEL_MAX = 1e-2
TOL_FORCE = 2e-3

STATE_NPZ = "/tmp/hw_validate_states.npz"
OUT_JSON = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "hw_validate.json")


def _cfg32():
    from parallel_nbody_tpu.config import SimConfig
    return SimConfig(force_mode="fast", dtype="float32", kernel="pallas")


def _fetch(*arrays):
    import jax
    import numpy as np
    return [np.asarray(jax.device_get(a)) for a in arrays]


def make_streamed_run(cfg, steps: int, band: int, tile: int):
    """A fused run whose force pass is the STREAMED kernel with an explicit
    (small) band, so multi-band accumulation runs even at small N.  Same
    step semantics as models/engine.step, including the coincident-pair
    runtime dispatch."""
    import jax
    from jax import lax

    from parallel_nbody_tpu.ops.integrate import (compute_positions,
                                                  compute_velocities)
    from parallel_nbody_tpu.ops.pallas_step import (
        forces_coincident_dispatch, pallas_block_forces_streamed)
    from parallel_nbody_tpu.state import State

    def step(s):
        xf, yf = forces_coincident_dispatch(
            s.x, s.y, s.mass,
            lambda biased: pallas_block_forces_streamed(
                cfg, s.x, s.y, s.mass, s.radius,
                s.x, s.y, s.mass, s.radius,
                tile_i=tile, tile_j=tile, band=band, biased=biased,
                accum=cfg.accum))
        xv, yv = compute_velocities(cfg, s.xv, s.yv, xf, yf, s.mass)
        x, y, xv, yv = compute_positions(cfg, s.x, s.y, xv, yv, mass=s.mass)
        return State(x, y, xv, yv, xf, yf, s.mass, s.radius)

    @jax.jit
    def run(s):
        return lax.fori_loop(0, steps, lambda _, t: step(t), s)

    return run


def hardware_phase() -> dict:
    import jax
    import numpy as np

    # Honor NBODY_PLATFORM like the CLI does (the JAX_PLATFORMS env var is
    # ignored by some ambient platform plugins) — lets CI exercise the
    # skip path deterministically.
    requested = os.environ.get("NBODY_PLATFORM")
    if requested:
        jax.config.update("jax_platforms", requested)

    from parallel_nbody_tpu.models.engine import run
    from parallel_nbody_tpu.ops.pallas_step import pallas_forces
    from parallel_nbody_tpu.state import init_state

    backend = jax.default_backend()
    info = {"backend": backend, "device": str(jax.devices()[0])}
    if backend != "tpu":
        return {**info, "skipped": True,
                "reason": "no TPU available; gate requires real hardware"}

    cfg = _cfg32()
    out = {}
    t0 = time.time()

    # --- case A: resident kernel, 20-step fused trajectory ----------------
    stA = init_state(N_SMALL, cfg)
    endA = run(cfg, stA, STEPS)
    out["A_x"], out["A_y"], out["A_xv"], out["A_yv"] = _fetch(
        endA.x, endA.y, endA.xv, endA.yv)
    print("case A (resident, N=%d, %d steps) ran in %.1f s"
          % (N_SMALL, STEPS, time.time() - t0), flush=True)

    # --- case F: compensated (Kahan) accumulation, same trajectory --------
    t0 = time.time()
    endF = run(cfg.replace(accum="compensated"), stA, STEPS)
    out["F_x"], out["F_y"], out["F_xv"], out["F_yv"] = _fetch(
        endF.x, endF.y, endF.xv, endF.yv)
    print("case F (compensated accum) ran in %.1f s" % (time.time() - t0),
          flush=True)

    # --- case B: streamed kernel forced small-band ------------------------
    t0 = time.time()
    runB = make_streamed_run(cfg, STEPS, band=1024, tile=512)
    endB = runB(stA)
    out["B_x"], out["B_y"], out["B_xv"], out["B_yv"] = _fetch(
        endB.x, endB.y, endB.xv, endB.yv)
    print("case B (streamed band=1024) ran in %.1f s" % (time.time() - t0),
          flush=True)

    # --- case B': streamed x compensated (cross-band Kahan under Mosaic) --
    t0 = time.time()
    runBp = make_streamed_run(cfg.replace(accum="compensated"), STEPS,
                              band=1024, tile=512)
    endBp = runBp(stA)
    out["Bp_x"], out["Bp_y"], out["Bp_xv"], out["Bp_yv"] = _fetch(
        endBp.x, endBp.y, endBp.xv, endBp.yv)
    print("case B' (streamed band=1024, compensated) ran in %.1f s"
          % (time.time() - t0), flush=True)

    # --- random micro-fuzz: seeded configs vs per-case fp64 oracles -------
    for i, spec in enumerate(random_case_specs()):
        t0 = time.time()
        c = cfg.replace(accum=spec["accum"])
        stR = init_state(spec["n"], c)
        if spec["variant"] == "resident":
            endR = run(c, stR, spec["steps"])
        else:
            endR = make_streamed_run(c, spec["steps"],
                                     band=1024, tile=512)(stR)
        (out["R%d_x" % i], out["R%d_y" % i],
         out["R%d_xv" % i], out["R%d_yv" % i]) = _fetch(
            endR.x, endR.y, endR.xv, endR.yv)
        print("random case R%d %s ran in %.1f s"
              % (i, spec, time.time() - t0), flush=True)

    # --- case C: streamed at scale ----------------------------------------
    t0 = time.time()
    stC = init_state(N_LARGE, cfg)

    @jax.jit
    def forces(s):
        return pallas_forces(cfg, s.x, s.y, s.mass, s.radius)

    f0x, f0y = forces(stC)
    out["C_f0x"], out["C_f0y"] = [a[:ROWS_CHECKED]
                                  for a in _fetch(f0x, f0y)]
    endC = run(cfg, stC, STEPS)
    out["C_x"], out["C_y"], out["C_xv"], out["C_yv"] = _fetch(
        endC.x, endC.y, endC.xv, endC.yv)
    f20x, f20y = forces(endC)
    out["C_f20x"], out["C_f20y"] = [a[:ROWS_CHECKED]
                                    for a in _fetch(f20x, f20y)]
    print("case C (streamed, N=%d) ran in %.1f s" % (N_LARGE,
                                                     time.time() - t0),
          flush=True)

    # --- cases D/E: the parallel PROGRAMS (allgather / ring / grid2d) -----
    # Both compare against the fused engine's endpoint (endC) directly: the
    # question is whether the sharded program text — ppermute loop /
    # row+col gathers + psum, with the per-block coincidence dispatch —
    # compiles to the same physics on real Mosaic/XLA-TPU, so the oracle is
    # the hardware fused run itself (no fp64 pass needed; agreement is
    # expected bit-exact on a 1-device mesh).
    from parallel_nbody_tpu.parallel.grid2d import (make_grid2d_run,
                                                    make_mesh2d,
                                                    shard_state_2d)
    from parallel_nbody_tpu.parallel.mesh import make_mesh, shard_state
    from parallel_nbody_tpu.parallel.sharded_step import make_sharded_run
    from parallel_nbody_tpu.state import pad_state

    parallel_programs = {}
    padded, _n_real = pad_state(stC, 128)  # N=262144: already aligned
    ref = {f: np.asarray(getattr(endC, f), np.float64)
           for f in ("x", "y", "xv", "yv", "xf", "yf")}

    def compare(tag, end):
        stats = {}
        ok = True
        for f, want in ref.items():
            got = np.asarray(getattr(end, f), np.float64)
            rel = float((np.abs(got - want) / (np.abs(want) + 1.0)).max())
            stats[f + "_max_rel"] = rel
            ok &= rel < 1e-4
        parallel_programs[tag] = {
            **stats, "ok": ok,
            "bit_identical": all(v == 0.0 for v in stats.values())}
        print("case %s vs fused engine: %s" % (tag, parallel_programs[tag]),
              flush=True)

    mesh1 = make_mesh(1)
    for comm in ("ring", "allgather"):
        t0 = time.time()
        endD = make_sharded_run(cfg, mesh1, STEPS, comm)(
            shard_state(padded, mesh1))
        jax.device_get(endD.x[:1])
        case = "D" if comm == "ring" else "D'"
        print("case %s (%s program, N=%d, %d steps) ran in %.1f s"
              % (case, comm, N_LARGE, STEPS, time.time() - t0), flush=True)
        compare(comm, endD)

    t0 = time.time()
    mesh2 = make_mesh2d(1, 1)
    endE = make_grid2d_run(cfg, mesh2, STEPS)(shard_state_2d(padded, mesh2))
    jax.device_get(endE.x[:1])
    print("case E (grid2d program, N=%d, %d steps) ran in %.1f s"
          % (N_LARGE, STEPS, time.time() - t0), flush=True)
    compare("grid2d", endE)

    # --- sabotage: gravity sign flip must be caught -----------------------
    t0 = time.time()
    endS = run(cfg.replace(gravity=-cfg.gravity), stA, STEPS)
    out["S_x"], out["S_y"], out["S_xv"], out["S_yv"] = _fetch(
        endS.x, endS.y, endS.xv, endS.yv)
    print("sabotage case ran in %.1f s" % (time.time() - t0), flush=True)

    np.savez(STATE_NPZ, **out)
    return {**info, "skipped": False, "parallel_programs": parallel_programs}


def _err_stats(got, want, kind: str, q: float = 99):
    """(max_abs, max_rel_floored, q-percentile_rel_floored) between fp32
    hardware output and the fp64 oracle, cast up to fp64."""
    import numpy as np
    g = np.asarray(got, np.float64)
    w = np.asarray(want, np.float64)
    d = np.abs(g - w)
    rel = d / (np.abs(w) + 1.0)
    return float(d.max()), float(rel.max()), float(np.percentile(rel, q))


def oracle_phase() -> dict:
    """CPU fp64 oracle computation + comparison (runs with x64 enabled)."""
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    import numpy as np

    from parallel_nbody_tpu.config import SimConfig
    from parallel_nbody_tpu.models.engine import run
    from parallel_nbody_tpu.ops.forces import forces_on_block
    from parallel_nbody_tpu.state import init_state

    z = np.load(STATE_NPZ)
    cfg = SimConfig(force_mode="fast", dtype="float64", kernel="xla")
    cases = {}
    ok_all = True

    # Trajectory oracle for cases A/B (identical config -> one oracle).
    t0 = time.time()
    end = jax.device_get(run(cfg, init_state(N_SMALL, cfg), STEPS))
    print("oracle trajectory (N=%d, %d steps fp64) in %.1f s"
          % (N_SMALL, STEPS, time.time() - t0), flush=True)

    for case in ("A", "B", "F", "Bp"):
        pos_abs = max(_err_stats(z[case + "_x"], end.x, "pos")[0],
                      _err_stats(z[case + "_y"], end.y, "pos")[0])
        sx = _err_stats(z[case + "_xv"], end.xv, "vel")
        sy = _err_stats(z[case + "_yv"], end.yv, "vel")
        vel_rel = max(sx[1], sy[1])
        vel_p99 = max(sx[2], sy[2])
        ok = (pos_abs < TOL_POS and vel_rel < TOL_VEL_MAX
              and vel_p99 < TOL_VEL_P99)
        ok_all &= ok
        cases["B'" if case == "Bp" else case] = {
            "pos_max_abs": pos_abs, "vel_max_rel": vel_rel,
            "vel_p99_rel": vel_p99, "ok": ok}

    # Random micro-fuzz: one fp64 trajectory oracle per seeded config.  The
    # velocity quantile gate is p90 here (coincident-pair population scales
    # ~N^2 and reaches the p99 rank at N=8192 — see module docstring).
    random_cases = []
    for i, spec in enumerate(random_case_specs()):
        t0 = time.time()
        endR = jax.device_get(run(cfg, init_state(spec["n"], cfg),
                                  spec["steps"]))
        pos_abs = max(_err_stats(z["R%d_x" % i], endR.x, "pos")[0],
                      _err_stats(z["R%d_y" % i], endR.y, "pos")[0])
        sx = _err_stats(z["R%d_xv" % i], endR.xv, "vel", q=90)
        sy = _err_stats(z["R%d_yv" % i], endR.yv, "vel", q=90)
        vel_rel = max(sx[1], sy[1])
        vel_p90 = max(sx[2], sy[2])
        ok = (pos_abs < TOL_POS and vel_rel < TOL_VEL_MAX
              and vel_p90 < TOL_VEL_P99)
        ok_all &= ok
        random_cases.append({**spec, "pos_max_abs": pos_abs,
                             "vel_max_rel": vel_rel, "vel_p90_rel": vel_p90,
                             "ok": ok})
        print("random oracle R%d (N=%d, %d steps fp64) in %.1f s -> %s"
              % (i, spec["n"], spec["steps"], time.time() - t0,
                 "ok" if ok else "FAIL"), flush=True)

    # Case C: row-wise force oracle at both endpoint states.
    stC = init_state(N_LARGE, cfg)

    @jax.jit
    def force_rows(x, y, m, r, r0):
        xi = jax.lax.dynamic_slice_in_dim(x, r0, ORACLE_ROW_CHUNK)
        yi = jax.lax.dynamic_slice_in_dim(y, r0, ORACLE_ROW_CHUNK)
        mi = jax.lax.dynamic_slice_in_dim(m, r0, ORACLE_ROW_CHUNK)
        ri = jax.lax.dynamic_slice_in_dim(r, r0, ORACLE_ROW_CHUNK)
        return forces_on_block(cfg, xi, yi, mi, ri, x, y, m, r,
                               same_block=False, gi0=r0, gj0=0)

    def oracle_forces(x, y, m, r):
        fxs, fys = [], []
        for r0 in range(0, ROWS_CHECKED, ORACLE_ROW_CHUNK):
            fx, fy = force_rows(x, y, m, r, r0)
            fxs.append(np.asarray(fx))
            fys.append(np.asarray(fy))
        return np.concatenate(fxs), np.concatenate(fys)

    t0 = time.time()
    arrs = [jax.numpy.asarray(a) for a in
            (stC.x, stC.y, stC.mass, stC.radius)]
    w_f0x, w_f0y = oracle_forces(*arrs)
    # Evolved-state oracle: the force operator evaluated on the positions the
    # HARDWARE produced (cast up), isolating the force kernel from
    # trajectory divergence.
    ex = jax.numpy.asarray(z["C_x"], jax.numpy.float64)
    ey = jax.numpy.asarray(z["C_y"], jax.numpy.float64)
    w_f20x, w_f20y = oracle_forces(ex, ey, arrs[2], arrs[3])
    print("oracle forces (2 x %d x %d fp64 pairs) in %.1f s"
          % (ROWS_CHECKED, N_LARGE, time.time() - t0), flush=True)

    f_rel = max(_err_stats(z["C_f0x"], w_f0x, "f")[1],
                _err_stats(z["C_f0y"], w_f0y, "f")[1])
    f20_rel = max(_err_stats(z["C_f20x"], w_f20x, "f")[1],
                  _err_stats(z["C_f20y"], w_f20y, "f")[1])
    okC = f_rel < TOL_FORCE and f20_rel < TOL_FORCE
    ok_all &= okC
    cases["C"] = {"force_step0_max_rel": f_rel,
                  "force_step20_max_rel": f20_rel, "ok": okC}

    # Sabotage: the gravity-flipped run must EXCEED the same tolerances.
    s_pos = max(_err_stats(z["S_x"], end.x, "pos")[0],
                _err_stats(z["S_y"], end.y, "pos")[0])
    s_vel = max(_err_stats(z["S_xv"], end.xv, "vel")[1],
                _err_stats(z["S_yv"], end.yv, "vel")[1])
    detected = s_pos >= TOL_POS or s_vel >= TOL_VEL_MAX
    ok_all &= detected
    cases["sabotage"] = {"pos_max_abs": s_pos, "vel_max_rel": s_vel,
                         "detected": detected}

    return {"cases": cases, "ok": ok_all,
            "random_cases": {"seed": RANDOM_SEED, "cases": random_cases},
            "tolerances": {"pos_abs": TOL_POS, "vel_rel_max": TOL_VEL_MAX,
                           "vel_rel_p99": TOL_VEL_P99,
                           "force_rel": TOL_FORCE},
            "n_small": N_SMALL, "n_large": N_LARGE, "steps": STEPS,
            "rows_checked": ROWS_CHECKED}


def main() -> int:
    if "--oracle" in sys.argv:
        verdict = oracle_phase()
        with open("/tmp/hw_validate_verdict.json", "w") as f:
            json.dump(verdict, f)
        return 0 if verdict["ok"] else 1

    hw = hardware_phase()
    if hw.get("skipped"):
        print(json.dumps(hw))
        return 0

    # Oracle in a subprocess: it needs float64 (process-global setting).
    # Remove any stale verdict first and require a clean exit — otherwise an
    # oracle crash could silently re-use a previous run's verdict and print
    # a false PASS.
    if os.path.exists("/tmp/hw_validate_verdict.json"):
        os.remove("/tmp/hw_validate_verdict.json")
    env = dict(os.environ)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--oracle"],
        env=env, timeout=3600)
    if proc.returncode not in (0, 1):  # 1 = ran and judged FAIL; else crash
        print("HW_VALIDATE ERROR: oracle subprocess exited %d"
              % proc.returncode)
        return 2
    with open("/tmp/hw_validate_verdict.json") as f:
        verdict = json.load(f)
    verdict.update(hw)
    for prog in hw.get("parallel_programs", {}).values():
        verdict["ok"] = verdict["ok"] and prog["ok"]
    verdict["when"] = time.strftime("%Y-%m-%d %H:%M:%S")
    with open(OUT_JSON, "w") as f:
        json.dump(verdict, f, indent=2)
    print(json.dumps(verdict, indent=2))
    print("HW_VALIDATE %s" % ("PASS" if verdict["ok"] else "FAIL"))
    return 0 if verdict["ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
