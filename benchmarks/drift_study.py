"""BASELINE config 3: N=64K long-run energy-drift study — fp32 plain vs
fp32 compensated (Kahan) accumulation vs the CPU fp64 oracle (VERDICT r3 #2),
plus the end-to-end bfloat16 precision column (VERDICT r4 #8).

Three measurements, all at N=65536 from the glibc init:

  1. force-operator accuracy: the fused Pallas force pass (plain and
     compensated) vs a CPU fp64 row oracle over the leading 8192 rows —
     quantifies the accumulation error the compensation targets.
  2. long-run energy drift: 5000 fp32 steps on hardware for each accum mode
     (10 x 500-step dispatches, under the ~60 s transport limit); total
     energy evaluated in fp64 on the CPU (chunked O(N^2) PE) at steps
     0 / 2500 / 5000; drift = |E_t - E_0| / |E_0|.
  3. cost: per-step wall time plain vs compensated on hardware.

The ``bfloat16`` mode runs the same three measurements with the WHOLE state
in bf16 (the TPU-native 16-bit type; float16 is rejected at config time —
see docs/DESIGN.md's dtype matrix).  Because bf16 cannot represent the
glibc init exactly (integers above 256 round under an 8-bit mantissa), its
force oracle and E0 are evaluated on the bf16-QUANTIZED inputs cast up to
fp64 — isolating kernel error from input quantization, which is reported
separately as ``init_quantization``.

Like benchmarks/hw_validate.py, the TPU phase (fp32/x32) and the CPU oracle
phase (fp64/x64) are separate processes (x64 is process-global).  Results in
benchmarks/drift_study.json; the keep/reject decision is recorded in
docs/REPORT.md.

A full 5000-step fp64 trajectory oracle at N=64K (2e13 pair evaluations,
~days on this box's core) is out of scope; the 20-step fp64 trajectory check
lives in hw_validate.py at N=4096.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = 65536
STEPS = 5000
CHUNK = 500
ENERGY_AT = (0, STEPS // 2, STEPS)
ORACLE_ROWS = 8192
ROW_CHUNK = 512

STATE_NPZ = "/tmp/drift_study_states.npz"
OUT_JSON = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "drift_study.json")


MODES = ("plain", "compensated", "bfloat16")


def _cfg(mode):
    from parallel_nbody_tpu.config import SimConfig
    if mode == "bfloat16":
        return SimConfig(force_mode="fast", dtype="bfloat16",
                         kernel="pallas")
    return SimConfig(force_mode="fast", dtype="float32", kernel="pallas",
                     accum=mode)


def hardware_phase() -> dict:
    import jax
    import numpy as np

    from parallel_nbody_tpu.models.engine import run
    from parallel_nbody_tpu.ops.pallas_step import pallas_forces
    from parallel_nbody_tpu.state import init_state

    if jax.default_backend() != "tpu":
        return {"skipped": True, "reason": "requires a real TPU"}

    out = {}
    info = {"device": str(jax.devices()[0]), "timings": {}}
    print("hw phase: init N=%d" % N, flush=True)
    st0 = init_state(N, _cfg("plain"))
    for f in ("x", "y", "xv", "yv", "mass", "radius"):
        out["s0_" + f] = np.asarray(getattr(st0, f))
    # The bf16 column runs from ITS OWN init (the glibc values quantize
    # under an 8-bit mantissa); save the quantized state cast up so the
    # oracle can evaluate on exactly what the hardware integrated.
    st0b = init_state(N, _cfg("bfloat16"))
    for f in ("x", "y", "xv", "yv", "mass", "radius"):
        out["s0b_" + f] = np.asarray(getattr(st0b, f), np.float32)

    for mode in MODES:
        cfg = _cfg(mode)
        st_init = st0b if mode == "bfloat16" else st0

        # 1. force operator on the init state (rows checked by the oracle).
        fx, fy = jax.jit(lambda s, c=cfg: pallas_forces(
            c, s.x, s.y, s.mass, s.radius, accum=c.accum))(st_init)
        out["f0x_" + mode] = np.asarray(fx, np.float32)[:ORACLE_ROWS]
        out["f0y_" + mode] = np.asarray(fy, np.float32)[:ORACLE_ROWS]
        print("forces(%s) done" % mode, flush=True)

        # 3. per-step cost: queued chunks, one completion fence, best of 3.
        ex = run.lower(cfg, st_init, CHUNK).compile()
        stw = ex(st_init)
        _ = np.asarray(stw.x[:1])  # warm + fence
        best = float("inf")
        for _rep in range(3):
            t0 = time.time()
            s = stw
            for _c in range(2):
                s = ex(s)
            _ = np.asarray(s.x[:1])
            best = min(best, (time.time() - t0) / (2 * CHUNK))
        info["timings"][mode] = best

        # 2. long-run trajectory with energy snapshots.
        st = st_init
        done = 0
        t0 = time.time()
        for target in ENERGY_AT:
            while done < target:
                st = ex(st)
                done += CHUNK
            _ = np.asarray(st.x[:1])
            for f in ("x", "y", "xv", "yv"):
                out["s%d_%s_%s" % (target, mode, f)] = np.asarray(
                    getattr(st, f), np.float32)
        print("%s: %d steps in %.1f s (%.2f ms/step best)"
              % (mode, STEPS, time.time() - t0, best * 1e3), flush=True)

    np.savez(STATE_NPZ, **out)
    return {**info, "skipped": False}


def oracle_phase() -> dict:
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    import jax.numpy as jnp
    import numpy as np

    from parallel_nbody_tpu.config import SimConfig
    from parallel_nbody_tpu.ops.forces import forces_on_block

    z = np.load(STATE_NPZ)
    cfg = SimConfig(force_mode="fast", dtype="float64", kernel="xla")
    g = cfg.gravity

    def f64(key):
        return jnp.asarray(z[key], jnp.float64)

    # Two input sets: the fp32 init (exact glibc values) and the bf16 init
    # (quantized under an 8-bit mantissa) — each mode's oracle evaluates on
    # exactly what its hardware run integrated.
    inputs = {
        "fp32": (f64("s0_x"), f64("s0_y"), f64("s0_mass"),
                 f64("s0_radius")),
        "bf16": (f64("s0b_x"), f64("s0b_y"), f64("s0b_mass"),
                 f64("s0b_radius")),
    }
    init_quant = {
        k + "_max_abs": float(np.abs(np.asarray(inputs["bf16"][i])
                                     - np.asarray(inputs["fp32"][i])).max())
        for i, k in enumerate(("x", "y", "mass"))}

    # --- fp64 force oracle over the leading rows -------------------------
    @jax.jit
    def force_rows(x, y, mass, radius, r0):
        xi = jax.lax.dynamic_slice_in_dim(x, r0, ROW_CHUNK)
        yi = jax.lax.dynamic_slice_in_dim(y, r0, ROW_CHUNK)
        mi = jax.lax.dynamic_slice_in_dim(mass, r0, ROW_CHUNK)
        ri = jax.lax.dynamic_slice_in_dim(radius, r0, ROW_CHUNK)
        return forces_on_block(cfg, xi, yi, mi, ri, x, y, mass, radius,
                               same_block=False, gi0=r0, gj0=0)

    oracle_f = {}
    for key, (x0, y0, m0, r0_) in inputs.items():
        t0 = time.time()
        wx, wy = [], []
        for r0 in range(0, ORACLE_ROWS, ROW_CHUNK):
            fx, fy = force_rows(x0, y0, m0, r0_, r0)
            wx.append(np.asarray(fx))
            wy.append(np.asarray(fy))
        oracle_f[key] = (np.concatenate(wx), np.concatenate(wy))
        print("fp64 force oracle[%s] (%d x %d) in %.1f s"
              % (key, ORACLE_ROWS, N, time.time() - t0), flush=True)

    force_err = {}
    for mode in MODES:
        wx, wy = oracle_f["bf16" if mode == "bfloat16" else "fp32"]
        dx = np.abs(z["f0x_" + mode].astype(np.float64) - wx)
        dy = np.abs(z["f0y_" + mode].astype(np.float64) - wy)
        rel = np.maximum(dx / (np.abs(wx) + 1.0), dy / (np.abs(wy) + 1.0))
        force_err[mode] = {"max_rel": float(rel.max()),
                           "mean_rel": float(rel.mean())}

    # --- fp64 total energy (chunked) -------------------------------------
    @jax.jit
    def energy_rows(x, y, xv, yv, mass, radius, r0):
        xi = jax.lax.dynamic_slice_in_dim(x, r0, ROW_CHUNK)
        yi = jax.lax.dynamic_slice_in_dim(y, r0, ROW_CHUNK)
        mi = jax.lax.dynamic_slice_in_dim(mass, r0, ROW_CHUNK)
        ri = jax.lax.dynamic_slice_in_dim(radius, r0, ROW_CHUNK)
        vxi = jax.lax.dynamic_slice_in_dim(xv, r0, ROW_CHUNK)
        vyi = jax.lax.dynamic_slice_in_dim(yv, r0, ROW_CHUNK)
        dx = x[None, :] - xi[:, None]
        dy = y[None, :] - yi[:, None]
        dsqr = dx * dx + dy * dy
        mind = ri[:, None] + radius[None, :]
        d = jnp.sqrt(jnp.maximum(jnp.maximum(dsqr, mind * mind), 1e-30))
        rows = r0 + jax.lax.broadcasted_iota(jnp.int32, dx.shape, 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, dx.shape, 1)
        pe = jnp.where(rows != cols,
                       -g * mi[:, None] * mass[None, :] / d, 0.0)
        ke = 0.5 * jnp.sum(mi * (vxi**2 + vyi**2))
        return ke + 0.5 * jnp.sum(pe)  # each unordered pair counted twice

    def energy(tag, mode):
        bf = mode == "bfloat16"
        pre = ("s0b_" if bf else "s0_") if tag == 0 \
            else "s%d_%s_" % (tag, mode)
        _, _, m0, r0_ = inputs["bf16" if bf else "fp32"]
        x, y = f64(pre + "x"), f64(pre + "y")
        xv, yv = f64(pre + "xv"), f64(pre + "yv")
        total = 0.0
        for r0 in range(0, N, ROW_CHUNK):
            total += float(energy_rows(x, y, xv, yv, m0, r0_, r0))
        return total

    t0 = time.time()
    e0 = {"fp32": energy(0, "plain"), "bf16": energy(0, "bfloat16")}
    drift = {}
    for mode in MODES:
        base = e0["bf16" if mode == "bfloat16" else "fp32"]
        drift[mode] = {"E0": base}
        for tag in ENERGY_AT[1:]:
            et = energy(tag, mode)
            drift[mode]["E%d" % tag] = et
            drift[mode]["drift_%d" % tag] = abs(et - base) / abs(base)
    print("fp64 energies in %.1f s" % (time.time() - t0), flush=True)

    return {"force_operator_vs_fp64": force_err, "energy": drift,
            "init_quantization": init_quant,
            "n": N, "steps": STEPS, "oracle_rows": ORACLE_ROWS}


def main() -> int:
    if "--oracle" in sys.argv:
        verdict = oracle_phase()
        with open("/tmp/drift_study_verdict.json", "w") as f:
            json.dump(verdict, f)
        return 0

    hw = hardware_phase()
    if hw.get("skipped"):
        print(json.dumps(hw))
        return 0

    env = dict(os.environ)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    subprocess.run([sys.executable, os.path.abspath(__file__), "--oracle"],
                   env=env, timeout=7200, check=True)
    with open("/tmp/drift_study_verdict.json") as f:
        verdict = json.load(f)
    verdict.update(hw)
    verdict["when"] = time.strftime("%Y-%m-%d %H:%M:%S")
    with open(OUT_JSON, "w") as f:
        json.dump(verdict, f, indent=2)
    print(json.dumps(verdict, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
