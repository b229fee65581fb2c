"""Command-line driver with the reference's argv contract.

Reference CLI (nbody-seq.c:386-499, nbody-par.c:768-978):

    num_bodies secs_per_update ppm_output_file steps
        [--run-xps] [--openmp] [--measure-comm]

plus TPU-era extensions (all optional, order-free):

    --devices=K       shard the body axis over K devices (default: all)
    --comm=MODE       "allgather" (default) or "ring" (ppermute streaming)
    --mesh2d=RxC      2-D force-matrix decomposition over an R x C mesh
                      (O(N/sqrt(P)) per-step comm; overrides --comm)
    --fast            transcendental-free force path (fp32/TPU speed path)
    --pallas          use the Pallas VMEM-tiled force kernel (implies --fast)
    --dtype=T         bfloat16 | float32 | float64 (default: float64 on
                      CPU, float32 on TPU).  float16 is rejected: the
                      reference mass law (mass = radius^3) overflows its
                      65504 max — see docs/DESIGN.md "dtype support matrix"
    --accum=MODE      "plain" (default) or "compensated" (Kahan-compensated
                      partial sums in the Pallas force kernels — the
                      fp64-emulated accumulation option; see
                      benchmarks/drift_study.py for its measured accuracy
                      and cost)
    --no-clamp        allow N > 10000 (the reference clamps to MAXBODIES)
    --check-nans      enable NaN debugging + post-run state validation
    --checkpoint=PATH save final state; PATH ending in .npz = exact host
                      snapshot (single-process parity path), anything else =
                      an Orbax directory written collectively from the
                      still-sharded state (no host gather — the sharded /
                      multi-process path)
    --resume=PATH     restore state and continue; an Orbax directory restores
                      each shard directly into the run's target sharding,
                      a .npz file restores the exact host snapshot
    --chunk-steps=K   cap steps per device dispatch (default: all steps in
                      one on-device loop — fastest; set K when the device
                      transport limits single-dispatch duration)
    --xps-precise     widen the par CSV's COMMTIME/RATIO fields to 6
                      decimals (sub-ms ICI collectives vanish at the
                      reference's %.3f); without it the par row byte-matches
                      nbody-par.c:956

Behavioral contract preserved exactly:
  - positional args parsed with C atoi/atol semantics (non-numeric -> 0,
    nbody-seq.c:421-435), so ``nbody abc 0 arena 10`` clamps to two bodies
  - bodyCt clamped to [2, 10000] with the reference's stderr messages
  - arena dims parsed from the P6 header
  - stderr: "Running N-body with %i bodies and %i steps"
  - stdout: final state (%10.3f x 6) or, under --run-xps, the CSV row
  - stderr: "\nN-body took: %.3f seconds" + "Performance N-body: %.2f GFLOPS"
  - secs_per_update > 0: frame rendered into the PPM when wall-clock elapsed
    exceeds it (display+msync analog)
  - --openmp is accepted for CLI parity; intra-chip parallelism is always on
    (VPU lanes are the OpenMP analog)
"""

from __future__ import annotations

import sys
import time
import zipfile

import numpy as np

from .config import MAXBODIES, SimConfig


def _fail_usage(prog: str) -> None:
    sys.stderr.write(
        "Usage: %s num_bodies secs_per_update ppm_output_file steps "
        "[--run-xps]\n" % prog)
    sys.exit(1)


def _atoi(s: str) -> int:
    """C atoi/atol semantics for the positional args (the reference parses
    them with atol/atoi, nbody-seq.c:421,430,435): skip leading whitespace,
    take an optional sign and any leading digits, stop at the first
    non-digit; no digits at all -> 0.  So ``nbody abc 0 arena 10`` runs with
    bodyCt=0 -> the "Using two bodies..." clamp, exactly like the C binary.
    """
    import re
    digits = re.match(r"\s*([+-]?\d*)", s).group(1)
    if digits in ("", "+", "-"):
        return 0
    return int(digits)


def cadence_chunk_cap(secsup: float, per_step: float) -> int:
    """Largest power-of-two steps-per-dispatch that keeps the wall-clock
    frame check running at least about every ``secsup`` seconds.

    The reference checks elapsed time EVERY step (nbody-seq.c:467-471); the
    chunked on-device loop checks between dispatches, so a frame could lag
    by one chunk's wall-time.  Capping the chunk at ~secsup worth of steps
    bounds that lag to ~secsup (frames at most ~2*secsup apart).  Power-of-
    two quantization bounds the number of distinct chunk programs compiled.
    """
    cap = int(secsup / max(per_step, 1e-9))
    if cap <= 1:
        return 1
    return 1 << (cap.bit_length() - 1)


def parse_args(argv):
    if len(argv) < 5:
        _fail_usage(argv[0])
    opts = {
        "run_xps": False, "openmp": False, "measure_comm": False,
        "devices": None, "comm": "allgather", "fast": False, "pallas": False,
        "dtype": None, "no_clamp": False, "checkpoint": None, "resume": None,
        "check_nans": False, "mesh2d": None, "chunk_steps": None,
        "xps_precise": False, "accum": "plain", "trace": None,
    }
    for a in argv[5:]:
        if a == "--run-xps":
            opts["run_xps"] = True
        elif a == "--openmp":
            opts["openmp"] = True
        elif a == "--measure-comm":
            opts["measure_comm"] = True
        elif a.startswith("--devices="):
            try:
                opts["devices"] = int(a.split("=", 1)[1])
                if opts["devices"] < 1:
                    raise ValueError
            except ValueError:
                sys.stderr.write("Bad --devices value (expected an "
                                 "integer >= 1): %s\n" % a)
                sys.exit(1)
        elif a.startswith("--comm="):
            opts["comm"] = a.split("=", 1)[1]
            if opts["comm"] not in ("allgather", "ring"):
                sys.stderr.write("Bad --comm value (expected allgather or "
                                 "ring): %s\n" % a)
                sys.exit(1)
        elif a.startswith("--mesh2d="):
            try:
                pr, pc = a.split("=", 1)[1].lower().split("x")
                opts["mesh2d"] = (int(pr), int(pc))
                if opts["mesh2d"][0] < 1 or opts["mesh2d"][1] < 1:
                    raise ValueError
            except ValueError:
                sys.stderr.write("Bad --mesh2d value (expected RxC, e.g. "
                                 "--mesh2d=2x4): %s\n" % a)
                sys.exit(1)
        elif a == "--fast":
            opts["fast"] = True
        elif a == "--pallas":
            opts["fast"] = True
            opts["pallas"] = True
        elif a.startswith("--dtype="):
            opts["dtype"] = a.split("=", 1)[1]
            if opts["dtype"] == "float16":
                # Rejected at parse time, not at first NaN: the reference
                # mass law mass = radius^3 (nbody-seq.c:444-447) exceeds
                # float16's 65504 max for any N >= 8 at the default arena,
                # and the pairwise force's mass_i*mass_j product overflows
                # it at EVERY N — a float16 run can only print NaNs.
                sys.stderr.write(
                    "--dtype=float16 is unsupported: the reference mass "
                    "law (mass = radius^3) overflows float16's 65504 max, "
                    "so every step would be NaN. Use --dtype=bfloat16 for "
                    "16-bit runs (see docs/DESIGN.md, dtype support "
                    "matrix).\n")
                sys.exit(1)
            if opts["dtype"] not in ("bfloat16", "float32", "float64"):
                sys.stderr.write("Bad --dtype value (expected bfloat16, "
                                 "float32 or float64): %s\n" % a)
                sys.exit(1)
        elif a.startswith("--accum="):
            opts["accum"] = a.split("=", 1)[1]
            if opts["accum"] not in ("plain", "compensated"):
                sys.stderr.write("Bad --accum value (expected plain or "
                                 "compensated): %s\n" % a)
                sys.exit(1)
        elif a.startswith("--chunk-steps="):
            try:
                opts["chunk_steps"] = int(a.split("=", 1)[1])
                if opts["chunk_steps"] < 1:
                    raise ValueError
            except ValueError:
                sys.stderr.write("Bad --chunk-steps value (expected an "
                                 "integer >= 1): %s\n" % a)
                sys.exit(1)
        elif a.startswith("--trace="):
            opts["trace"] = a.split("=", 1)[1]
            if not opts["trace"]:
                sys.stderr.write("Bad --trace value (expected a directory "
                                 "path): %s\n" % a)
                sys.exit(1)
        elif a == "--xps-precise":
            opts["xps_precise"] = True
        elif a == "--no-clamp":
            opts["no_clamp"] = True
        elif a == "--check-nans":
            opts["check_nans"] = True
        elif a.startswith("--checkpoint="):
            opts["checkpoint"] = a.split("=", 1)[1]
        elif a.startswith("--resume="):
            opts["resume"] = a.split("=", 1)[1]
        else:
            sys.stderr.write("Unknown flag: %s\n" % a)
            sys.exit(1)
    n = _atoi(argv[1])
    if not opts["no_clamp"]:
        if n > MAXBODIES:
            sys.stderr.write("Using only %d bodies...\n" % MAXBODIES)
            n = MAXBODIES
        elif n < 2:
            sys.stderr.write("Using two bodies...\n")
            n = 2
    secsup = _atoi(argv[2])
    ppm_path = argv[3]
    steps = _atoi(argv[4])
    return n, secsup, ppm_path, steps, opts


def main(argv=None) -> int:
    argv = list(sys.argv if argv is None else argv)
    n, secsup, ppm_path, steps, opts = parse_args(argv)

    import os

    import jax

    # Honor a requested platform via jax.config (authoritative even where an
    # ambient platform plugin ignores the JAX_PLATFORMS env var).  Must run
    # before first device use.
    requested_platform = (os.environ.get("NBODY_PLATFORM")
                          or os.environ.get("JAX_PLATFORMS"))
    if requested_platform:
        jax.config.update("jax_platforms", requested_platform)

    from .parallel import multihost
    if multihost.running_under_pod_launcher():
        try:
            multihost.initialize()
        except Exception as e:  # never let launcher quirks kill a local run
            sys.stderr.write("multihost init skipped: %s\n" % e)

    if opts["check_nans"]:
        from .utils.debug import enable_nan_checks
        enable_nan_checks()

    platform = jax.default_backend()
    if opts["dtype"] is None:
        opts["dtype"] = "float64" if platform == "cpu" else "float32"
    if opts["dtype"] == "float64":
        jax.config.update("jax_enable_x64", True)

    from .models.engine import run
    from .parallel.mesh import make_mesh, shard_state
    from .parallel.sharded_step import make_sharded_run
    from .state import State, init_state, pad_state, unpad_state
    from .utils import checkpoint as ckpt
    from .utils import ppm as ppmio
    from .utils.output import (format_state, nr_flops, xps_csv_par,
                               xps_csv_seq)

    # Rank-0-only reporting, exactly like the reference's parallel driver
    # (nbody-par.c:939-959): in a multi-process launch every process runs the
    # same program but only process 0 speaks.
    rank0 = jax.process_index() == 0

    try:
        ppm = ppmio.read_header(ppm_path)
    except (OSError, ppmio.PPMError) as e:
        sys.stderr.write("Cannot read %s: %s\n" % (ppm_path, e))
        return 1

    cfg = SimConfig(
        xdim=ppm.xdim, ydim=ppm.ydim,
        force_mode="fast" if opts["fast"] else "trig",
        dtype=opts["dtype"],
        kernel="pallas" if opts["pallas"] else "xla",
        accum=opts["accum"],
        # Off-TPU, the TPU kernel runs in interpret mode (same kernel
        # semantics, emulated) so the --pallas variant is testable on the
        # virtual CPU mesh.
        pallas_interpret=opts["pallas"] and platform != "tpu",
    )

    if rank0:
        sys.stderr.write("Running N-body with %i bodies and %i steps\n"
                         % (n, steps))

    if opts["mesh2d"]:
        n_dev = opts["mesh2d"][0] * opts["mesh2d"][1]
        if opts["devices"] not in (None, n_dev):
            sys.stderr.write(
                "--mesh2d=%dx%d implies %d devices; conflicting "
                "--devices=%d\n" % (opts["mesh2d"][0], opts["mesh2d"][1],
                                    n_dev, opts["devices"]))
            return 1
        if n_dev == 1 and rank0:
            sys.stderr.write("Note: --mesh2d=1x1 is a single-device run "
                             "(no 2-D decomposition)\n")
    else:
        n_dev = opts["devices"] or len(jax.devices())
    multi = n_dev > 1
    if multi:
        try:
            if opts["mesh2d"]:
                from .parallel.grid2d import make_mesh2d, shard_state_2d
                mesh = make_mesh2d(*opts["mesh2d"])
            else:
                mesh = make_mesh(n_dev)
        except ValueError as e:
            sys.stderr.write("%s\n" % e)
            return 1
    # Pallas tiles need the shard size to stay tile-aligned.
    pad_mult = n_dev * (128 if opts["pallas"] else 1)

    # --resume: a directory is an Orbax (sharded) checkpoint, a file the
    # exact-parity .npz.  An Orbax resume on a 1-D mesh whose padded length
    # matches restores each shard straight into the target sharding — no
    # process ever holds the full state (VERDICT r2 #6).
    start_step = 0
    pre_sharded = False
    if opts["resume"]:
        try:
            if os.path.isdir(opts["resume"]):
                meta = ckpt.orbax_metadata_tree(opts["resume"])
                saved_len = ckpt.orbax_saved_length(opts["resume"], meta)
                target = None
                if multi and not opts["mesh2d"] and \
                        saved_len == n + ((-n) % pad_mult):
                    from .parallel.mesh import body_sharding
                    target = body_sharding(mesh)
                state, start_step, n_ck = ckpt.load_state_orbax(
                    opts["resume"], cfg, sharding=target, meta_tree=meta)
                if n_ck is None:
                    # Pre-n_real checkpoint: the body count comes from argv;
                    # anything past n is sharding padding.
                    if saved_len < n:
                        raise ValueError(
                            "checkpoint holds only %d bodies" % saved_len)
                    n_ck = n
                if target is not None:
                    n_real, pre_sharded = n_ck, True
                else:
                    state = unpad_state(state, n_ck)
            else:
                state, start_step = ckpt.load_state(opts["resume"], cfg)
                n_ck = state.n
        except (OSError, ValueError, KeyError, EOFError,
                zipfile.BadZipFile) as e:
            # EOFError / BadZipFile: numpy's npz loader raises these (not
            # OSError) for truncated or corrupted archives.
            sys.stderr.write("Cannot resume from %s: %s\n"
                             % (opts["resume"], e))
            return 1
        if n_ck != n:
            sys.stderr.write("Checkpoint has %d bodies, expected %d\n"
                             % (n_ck, n))
            return 1
    else:
        state = init_state(n, cfg)
    remaining = max(0, steps - start_step)

    if multi and not pre_sharded:
        state, n_real = pad_state(state, pad_mult)
        state = (shard_state_2d(state, mesh) if opts["mesh2d"]
                 else shard_state(state, mesh))
    elif not multi:
        n_real = n

    # Huge single-chip Pallas runs (N=10M scale): one fused dispatch would be
    # ~490 s of device work at N=10M (docs/REPORT.md) — far past transports
    # that bound per-dispatch duration — so the step is dispatched in
    # bounded row chunks driven from the host (models.engine.
    # make_hosted_row_step); rendering likewise host-chunks the body axis.
    # The threshold is env-overridable so tests can drive this path at
    # CPU-sized N (interpret mode).
    huge_threshold = int(os.environ.get("NBODY_HUGE_THRESHOLD", 2_000_000))
    huge = not multi and opts["pallas"] and n > huge_threshold

    def _fence(a):
        return jax.device_get(a[:1])

    # AOT-compiled executables per chunk size (compile happens once, outside
    # the timed region, and the compiled object is what the loop invokes).
    compiled_cache = {}

    def compile_chunk(k):
        if huge:
            if "huge" not in compiled_cache:
                from .models.engine import make_hosted_row_step
                step_fn, warmup = make_hosted_row_step(cfg, n)
                warmup()
                compiled_cache["huge"] = step_fn
            step_fn = compiled_cache["huge"]

            def run_k(st, _k=k):
                for _ in range(_k):
                    st = step_fn(st, fence=_fence)
                return st

            return run_k
        if k not in compiled_cache:
            if multi and opts["mesh2d"]:
                from .parallel.grid2d import make_grid2d_run
                fn = make_grid2d_run(cfg, mesh, k)
                compiled_cache[k] = fn.lower(state).compile()
            elif multi:
                fn = make_sharded_run(cfg, mesh, k, opts["comm"])
                compiled_cache[k] = fn.lower(state).compile()
            else:
                compiled_cache[k] = run.lower(cfg, state, k).compile()
        return compiled_cache[k]

    def run_chunk(st, k):
        return compile_chunk(k)(st)

    comm_time = 0.0
    render_fn = None
    if secsup > 0 and jax.process_count() == 1:
        # The reference's PARALLEL binary never renders (display() is
        # duplicated but never called, nbody-par.c:674-702; secsup parsed
        # but unused) — multi-process runs match that and skip frames.
        from .ops.render import render_frame, render_frame_hosted

        # Beyond ~256K bodies, chunk the body axis so the per-chunk hit
        # intermediate stays bounded regardless of XLA's fusion choices
        # (the chunk size is proven on-TPU by benchmarks/huge_n.py); beyond
        # 2M the on-device chunk loop itself would be one multi-ten-second
        # dispatch, so the chunks become separate host-driven dispatches.
        body_chunk = None if state.n <= 262144 else 262144
        # Optional frame accounting for tests/instrumentation: append one
        # line per rendered frame to the named file.
        frame_log = os.environ.get("NBODY_FRAME_LOG")

        def render_fn(st):
            if st.n > huge_threshold:
                frame = render_frame_hosted(cfg, st.x, st.y, st.radius,
                                            n_real, fence=_fence)
            else:
                frame = np.asarray(jax.device_get(render_frame(
                    cfg, st.x, st.y, st.radius, n_real, 32, body_chunk)))
            ppmio.write_pixels(ppm, frame)
            if frame_log:
                # Self-evidencing frame record (VERDICT r4 #5): pixel/tint
                # counts and a content hash, so a recorded run's log backs
                # any claim made about the rendered frame.
                import hashlib
                px = np.asarray(frame).reshape(-1, 3)
                lit = px[(px != 0).any(axis=1)]
                with open(frame_log, "a") as f:
                    f.write("frame %.3f nonzero=%d tints=%d md5=%s\n"
                            % (time.time(), lit.shape[0],
                               np.unique(lit, axis=0).shape[0],
                               hashlib.md5(px.tobytes()).hexdigest()))

    if opts["measure_comm"] and opts["run_xps"] and multi:
        from .utils.timing import measure_comm_fraction
        comm_time_per_step = measure_comm_fraction(
            cfg, mesh, state, "grid2d" if opts["mesh2d"] else opts["comm"])
    else:
        comm_time_per_step = 0.0

    # AOT-compile the exact program(s) outside the timed region (the
    # reference times pure simulation work; nbody-par brackets with
    # MPI_Barrier similarly — XLA compilation is our one-time launcher
    # cost).  The chunked loop may end with a partial chunk; pre-compile
    # that size too so no compile lands inside the timed region.
    chunked = secsup > 0 or opts["chunk_steps"]
    chunk = max(1, min(1000, remaining // 20 or 1))
    if opts["chunk_steps"]:
        chunk = min(chunk, opts["chunk_steps"]) if secsup > 0 \
            else opts["chunk_steps"]
    if huge:
        # Each huge step is already many bounded dispatches and tens of
        # seconds of wall time; check the frame clock every step (and never
        # run a probe step — it would cost a full force pass).
        chunk = 1
    if render_fn is not None and remaining > 0 and chunk > 1:
        # Frame-cadence fidelity (reference: the elapsed check runs EVERY
        # step, nbody-seq.c:467-471): probe one step's wall time on a
        # discarded copy of the state — compile and probe both land outside
        # the timed region — and cap the chunk so the between-dispatch check
        # runs at least about every ``secsup`` seconds.
        probe = compile_chunk(1)
        # _fence (a one-element readback), NOT block_until_ready: tunneled
        # transports return from block_until_ready before device work
        # completes, which would make per_step measure dispatch-queue time
        # and defeat the cadence cap (see the fence note below).
        _fence(probe(state).x)  # separate warm-up dispatch
        t_probe = time.time()
        _fence(probe(state).x)
        chunk = min(chunk, cadence_chunk_cap(secsup, time.time() - t_probe))
    if remaining > 0:
        if chunked:
            compile_chunk(min(chunk, remaining))
            if remaining > chunk and remaining % chunk:
                compile_chunk(remaining % chunk)
        else:
            compile_chunk(remaining)

    # --trace=DIR: wrap the timed region in a jax.profiler trace (the
    # deep-profiling path the reference lacks, SURVEY.md §5) and report the
    # trace-derived collective share afterwards.  Profiling overhead lands
    # inside the timed region by nature; use untraced runs for headline
    # timing.
    tracer = None
    if opts["trace"] and rank0:
        from .utils.timing import trace as trace_ctx
        tracer = trace_ctx(opts["trace"])
        try:
            tracer.__enter__()
        except Exception as e:  # unwritable dir etc. — profiling is
            sys.stderr.write(   # auxiliary, never kill the simulation
                "Cannot start trace at %s: %s\n" % (opts["trace"], e))
            tracer = None

    t0 = time.time()
    try:
        if chunked and remaining > 0:
            # Host-chunked loop: wall-clock-driven frame updates (reference
            # main loop, nbody-seq.c:457-472) and/or a per-dispatch step cap
            # (--chunk-steps, for transports limiting dispatch duration).
            lastup = 0.0
            done = 0
            while done < remaining:
                k = min(chunk, remaining - done)
                state = run_chunk(state, k)
                done += k
                if render_fn is not None:
                    # Completion fence BEFORE the elapsed check: dispatches
                    # are async, so without it the loop queues every chunk
                    # in milliseconds and the wall-clock test fires at most
                    # once — the reference's cadence (nbody-seq.c:467-471)
                    # is measured against completed simulation work.  Must
                    # be the readback fence: on tunneled transports
                    # block_until_ready returns early, which would
                    # reintroduce the queued-dispatch bug.  (--chunk-steps
                    # without rendering keeps the faster queued-dispatch
                    # pattern.)
                    _fence(state.x)
                    if time.time() - lastup > secsup:
                        render_fn(state)
                        lastup = time.time()
        elif remaining > 0:
            state = run_chunk(state, remaining)
        jax.block_until_ready(state)
        if jax.process_count() == 1:
            # Tunneled/async device transports can return from
            # block_until_ready before device work completes; a one-element
            # readback is a true completion fence (see docs/REPORT.md).
            jax.device_get(state.x[:1])
    except BaseException:
        # A failure mid-run (NaN under --check-nans, device error, Ctrl-C)
        # must still finalize the trace — it is exactly the profile the
        # user wants for debugging the failure.
        if tracer is not None:
            try:
                tracer.__exit__(None, None, None)
            except Exception:
                pass
        raise
    rtime = time.time() - t0
    if tracer is not None:
        try:
            tracer.__exit__(None, None, None)
        except Exception as e:  # stop_trace failing (disk full, ...) must
            sys.stderr.write(   # not discard the completed simulation
                "Cannot finish trace at %s: %s\n" % (opts["trace"], e))
        else:
            try:
                from .utils.timing import trace_comm_share
                ts = trace_comm_share(opts["trace"])
                sys.stderr.write(
                    "Trace: op time %.3f s, collectives %.3f s (%.2f%% "
                    "share) -> %s\n" % (ts["op_us"] / 1e6,
                                        ts["collective_us"] / 1e6,
                                        100.0 * ts["share"], opts["trace"]))
            except Exception as e:  # a missing/odd trace must not kill it
                sys.stderr.write("Trace written to %s (share extraction "
                                 "failed: %s)\n" % (opts["trace"], e))
    comm_time = comm_time_per_step * remaining

    # Throughput accounting covers only the steps actually executed (with
    # --resume that is fewer than ``steps``).
    flops = nr_flops(n, remaining)
    gflops = flops / 1e9 / rtime if rtime > 0 else float("nan")

    # --checkpoint to a directory = Orbax, written from the STILL-SHARDED
    # state before any gather (each process saves only its shards; in a
    # multi-process run the save is collective, so every rank calls it).
    # A .npz path keeps the exact-parity host snapshot written after the
    # gather below.
    # The state's true step count: with --resume past the argv target
    # (start_step > steps) no steps run, and recording argv's ``steps``
    # would silently rewind the counter without rewinding the state.
    done_steps = start_step + remaining
    ckpt_orbax = opts["checkpoint"] and not opts["checkpoint"].endswith(
        ".npz")
    if ckpt_orbax:
        try:
            ckpt.save_state_orbax(opts["checkpoint"], state, done_steps,
                                  n_real)
        except Exception as e:  # noqa: BLE001 — mirror the resume guard:
            # e.g. Orbax refuses host-local (unsharded) arrays in a
            # multi-process run; report and still deliver the run's output.
            sys.stderr.write("Cannot checkpoint to %s: %s\n"
                             % (opts["checkpoint"], e))

    if multi:
        if jax.process_count() > 1:
            # Globally-sharded result: re-assemble the full state on every
            # process (the reference's final state is likewise complete on
            # rank 0 after the last Allgatherv, nbody-par.c:913-944).
            from jax.experimental import multihost_utils
            state = State(*(
                np.asarray(multihost_utils.process_allgather(a, tiled=True))
                for a in state))
        else:
            state = jax.device_get(state)
        state = unpad_state(state, n_real)

    if opts["checkpoint"] and not ckpt_orbax and rank0:
        try:
            ckpt.save_state(opts["checkpoint"], state, done_steps)
        except OSError as e:
            # Same contract as the Orbax guard above: a failed save (e.g. a
            # missing parent directory) must not crash the driver into a
            # traceback after the whole simulation ran — report it and
            # still deliver the run's output below.
            sys.stderr.write("Cannot checkpoint to %s: %s\n"
                             % (opts["checkpoint"], e))

    if opts["check_nans"]:
        from .utils.debug import validate_state
        diag = validate_state(state, cfg.xdim, cfg.ydim)
        if not diag.ok():
            sys.stderr.write("State validation FAILED: NaNs in %s\n"
                             % ",".join(diag.nan_fields))
            return 1
        sys.stderr.write(
            "State validation ok: max|v|=%.3g max|f|=%.3g in_bounds=%s\n"
            % (diag.max_speed, diag.max_force, diag.pos_in_bounds))

    if rank0:
        if not opts["run_xps"]:
            sys.stdout.write(format_state(state))
        elif multi:
            # SIZE,NODES,CPUS_PER_NODE,... -> (total chips, hosts, chips/host).
            nodes = max(1, jax.process_count())
            sys.stdout.write(xps_csv_par(n_dev, nodes, n_dev // nodes, n,
                                         rtime, comm_time, gflops,
                                         precise=opts["xps_precise"]) + "\n")
        else:
            sys.stdout.write(xps_csv_seq(n, rtime, gflops) + "\n")

        sys.stderr.write("\nN-body took: %.3f seconds\n" % rtime)
        sys.stderr.write("Performance N-body: %.2f GFLOPS\n" % gflops)
    return 0


if __name__ == "__main__":
    sys.exit(main())
