"""bin/fuzz-parity.sh — randomized differential parity against the
reference binary (the automated version of a fresh-oracle probe).

The script's oracle is the compiled reference program itself
(/root/reference/nbody/nbody-seq), so unlike bin/tests.sh (whose oracle is
our own --devices=1 run) a pass here is end-to-end external evidence.
"""

import os
import subprocess

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFBIN = "/root/reference/nbody/nbody-seq"


def _run_fuzz(count, seed, out_dir, timeout=900, script="fuzz-parity.sh"):
    # NBODY_FUZZ_OUT keeps test artifacts (whose .err files carry
    # nondeterministic timings) out of the committed tests_out/fuzz* records.
    env = dict(os.environ)
    env["NBODY_FUZZ_OUT"] = str(out_dir)
    return subprocess.run(
        ["bash", os.path.join(REPO, "bin", script), str(count), str(seed)],
        capture_output=True, text=True, timeout=timeout, cwd=REPO, env=env)


@pytest.mark.slow
def test_fuzz_parity_two_random_configs(tmp_path):
    if not os.access(REFBIN, os.X_OK):
        pytest.skip("reference checkout unavailable")
    proc = _run_fuzz(2, 918273, tmp_path)
    assert proc.returncode == 0, proc.stdout + proc.stderr
    lines = [l for l in proc.stdout.splitlines() if l.startswith("PASSED")]
    assert len(lines) == 2, proc.stdout + proc.stderr


def _pick_parity2_seed():
    """Find a seed whose 2-config parity2 draw covers the two NEW axes —
    at least one PROCS=2 config (the jax.distributed launcher leg) and at
    least one explicit kernel flag — while staying cheap (sum of N*steps
    bounds the fp64 pair work).  Searching keeps the test robust to future
    changes in fuzz_gen's draw order."""
    for seed in range(1, 96):
        cfgs = _gen("parity2", seed, 2)
        cost = sum(int(c[0]) * int(c[1]) for c in cfgs)
        if (any(c[2] == "2" for c in cfgs)
                and any("--pallas" in c or "--fast" in c for c in cfgs)
                and cost <= 12000):
            return seed
    pytest.fail("no seed in 1..95 gives 2 cheap parity2 configs covering a "
                "2-process draw plus a kernel flag; widen the search range "
                "or relax the coverage predicate")


@pytest.mark.slow
def test_fuzz_parity_v2_two_random_configs(tmp_path):
    """bin/fuzz-parity-v2.sh — the variant/process-axis fuzz: configs drawn
    by the parity2 generator run through the 2-process jax.distributed
    launcher and/or a non-default kernel, byte-diffed against the reference
    binary."""
    if not os.access(REFBIN, os.X_OK):
        pytest.skip("reference checkout unavailable")
    seed = _pick_parity2_seed()
    proc = _run_fuzz(2, seed, tmp_path, timeout=1800,
                     script="fuzz-parity-v2.sh")
    assert proc.returncode == 0, proc.stdout + proc.stderr
    lines = [l for l in proc.stdout.splitlines() if l.startswith("PASSED")]
    assert len(lines) == 2, proc.stdout + proc.stderr


def _pick_resume_seed():
    """Find a seed whose 2-config resume draw covers BOTH checkpoint
    formats (npz and orbax) AND at least one pipe-joined flag pair, so the
    harness's npz-suffix branch and its '|'->' ' flag substitution are both
    exercised live.  Searching (instead of hardcoding a seed) keeps the
    test robust to future changes in fuzz_gen's draw order."""
    for seed in range(1, 64):
        cfgs = _gen("resume", seed, 2)
        if ({c[3] for c in cfgs} == {"npz", "orbax"}
                and any("|" in c[4] or "|" in c[5] for c in cfgs)):
            return seed
    pytest.fail("no seed in 1..63 gives 2 resume configs covering both "
                "checkpoint formats plus a pipe-joined flag pair; widen "
                "the search range or relax the coverage predicate")


@pytest.mark.slow
def test_fuzz_resume_two_random_configs(tmp_path):
    """bin/fuzz-resume.sh — checkpoint at a random split step under one
    random sharding, resume under another, byte-diff BOTH legs against the
    reference binary's uninterrupted runs."""
    if not os.access(REFBIN, os.X_OK):
        pytest.skip("reference checkout unavailable")
    seed = _pick_resume_seed()
    proc = _run_fuzz(2, seed, tmp_path, timeout=1200, script="fuzz-resume.sh")
    assert proc.returncode == 0, proc.stdout + proc.stderr
    lines = [l for l in proc.stdout.splitlines() if l.startswith("PASSED")]
    assert len(lines) == 2, proc.stdout + proc.stderr


def _pick_resume2_seed():
    """Find a seed whose 2-config resume2 draw exercises the NEW axis for
    real — at least one CROSS-KERNEL hand-off (the two legs' kernel flags
    differ, so the checkpoint is written under one kernel and resumed under
    another) — while staying cheap (total fp64 pair work bounded).
    Searching keeps the test robust to changes in fuzz_gen's draw order."""
    def kern(leg):
        flags = leg.split("|")
        return next((f for f in flags if f in ("--fast", "--pallas")), "")

    for seed in range(1, 96):
        cfgs = _gen("resume2", seed, 2)
        cost = sum(int(c[0]) * int(c[1]) for c in cfgs)
        if (any(kern(c[4]) != kern(c[5]) for c in cfgs) and cost <= 24000):
            return seed
    pytest.fail("no seed in 1..95 gives 2 cheap resume2 configs covering a "
                "cross-kernel checkpoint hand-off; widen the search range "
                "or relax the coverage predicate")


@pytest.mark.slow
def test_fuzz_resume_v2_two_random_configs(tmp_path):
    """bin/fuzz-resume-v2.sh — the kernel-variant-axis resume fuzz: each leg
    draws its own kernel (trig/--fast/--pallas) on top of its sharding, so a
    checkpoint written under one kernel is resumed under another; both legs
    byte-diffed against the reference binary's uninterrupted runs."""
    if not os.access(REFBIN, os.X_OK):
        pytest.skip("reference checkout unavailable")
    seed = _pick_resume2_seed()
    proc = _run_fuzz(2, seed, tmp_path, timeout=1200,
                     script="fuzz-resume-v2.sh")
    assert proc.returncode == 0, proc.stdout + proc.stderr
    lines = [l for l in proc.stdout.splitlines() if l.startswith("PASSED")]
    assert len(lines) == 2, proc.stdout + proc.stderr


def test_fuzz_resume_skips_cleanly_without_reference(tmp_path):
    env = dict(os.environ)
    env["NBODY_REF_BIN"] = str(tmp_path / "missing-binary")
    env["NBODY_FUZZ_OUT"] = str(tmp_path / "out")
    proc = subprocess.run(
        ["bash", os.path.join(REPO, "bin", "fuzz-resume.sh"), "1", "1"],
        capture_output=True, text=True, timeout=120, cwd=REPO, env=env)
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "SKIPPED" in proc.stdout


def test_fuzz_skips_cleanly_without_reference(tmp_path):
    env = dict(os.environ)
    env["NBODY_REF_BIN"] = str(tmp_path / "missing-binary")
    env["NBODY_FUZZ_OUT"] = str(tmp_path / "out")
    proc = subprocess.run(
        ["bash", os.path.join(REPO, "bin", "fuzz-parity.sh"), "1", "1"],
        capture_output=True, text=True, timeout=120, cwd=REPO, env=env)
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "SKIPPED" in proc.stdout


# The committed sweep records were produced from exactly these generator
# streams (bin/fuzz_gen.py draw order is load-bearing — see its docstring).
# The 918273x2 parity entry is an early test invocation that recorded into
# the sweep directory before NBODY_FUZZ_OUT redirection existed; it is part
# of the record and must stay reproducible like the deliberate sweeps.
PARITY_SWEEPS = [(20260818, 5), (42, 20), (777, 30), (918273, 2), (2026, 8),
                 (31337, 12), (555, 8)]
RESUME_SWEEPS = [(20260818, 12), (2026, 4), (31337, 5), (555, 4)]
# parity2 (round 5): the variant/process-axis generator — see
# bin/fuzz-parity-v2.sh; records live in tests_out/fuzz_v2.
PARITY2_SWEEPS = [(20260818, 24), (555, 6), (9090, 6)]
# resume2 (round 5): per-leg kernel draw on the resume fuzz — see
# bin/fuzz-resume-v2.sh; records live in tests_out/fuzz_resume_v2.
RESUME2_SWEEPS = [(20260818, 16), (2468, 4)]


def _gen(kind, seed, count):
    out = subprocess.check_output(
        ["python", os.path.join(REPO, "bin", "fuzz_gen.py"),
         kind, str(seed), str(count)], text=True)
    return [line.split() for line in out.splitlines()]


def _mangle(s):
    # Mirrors the harness scripts' `tr ' =' '__'` (and fuzz-resume's
    # pre-substitution of '|' separators back to spaces).
    return s.replace("|", " ").replace(" ", "_").replace("=", "_")


def test_recorded_sweeps_reproducible_from_generator_streams():
    """Every committed sweep artifact maps 1:1 onto the generator streams
    above, the directories hold NOTHING ELSE (stray checkpoints, orphan
    diffs, leftover junk all fail), and every recorded diff (both legs, for
    resume) is empty.  Fails if fuzz_gen.py's draw order changes, a record
    goes stale, or an unexplained artifact appears."""
    expected = set()
    for seed, count in PARITY_SWEEPS:
        for n, steps, *flags in _gen("parity", seed, count):
            base = "fuzz_%s_%s_%s" % (n, steps, _mangle(" ".join(flags)))
            expected.update(base + ext for ext in (".out", ".err", ".diff"))
            expected.add("seq_%s_%s.out" % (n, steps))  # cached oracle
    actual = set(os.listdir(os.path.join(REPO, "tests_out", "fuzz")))
    # The harness's throwaway arena copy is gitignored but present on any
    # machine that has actually run a sweep.
    actual.discard("arena.ppm")
    assert actual == expected, (sorted(actual - expected),
                                sorted(expected - actual))

    expected = set()
    for seed, count in PARITY2_SWEEPS:
        for n, steps, procs, *flags in _gen("parity2", seed, count):
            base = "fuzz_%s_%s_p%s_%s" % (n, steps, procs,
                                          _mangle(" ".join(flags)))
            expected.update(base + ext for ext in (".out", ".err", ".diff"))
            expected.add("seq_%s_%s.out" % (n, steps))
    actual = set(os.listdir(os.path.join(REPO, "tests_out", "fuzz_v2")))
    actual.discard("arena.ppm")
    assert actual == expected, (sorted(actual - expected),
                                sorted(expected - actual))

    for kind, sweeps, subdir in (("resume", RESUME_SWEEPS, "fuzz_resume"),
                                 ("resume2", RESUME2_SWEEPS,
                                  "fuzz_resume_v2")):
        expected = set()
        for n, total, split, fmt, f1, f2 in [c for s, c_ in sweeps
                                             for c in _gen(kind, s, c_)]:
            base = ("resume_%s_%sof%s_%s_%s_%s"
                    % (n, split, total, fmt, _mangle(f1), _mangle(f2)))
            expected.update(base + ext for ext in (
                ".out", ".err", ".diff",
                ".leg1.out", ".leg1.err", ".leg1.diff"))
            expected.add("seq_%s_%s.out" % (n, split))
            expected.add("seq_%s_%s.out" % (n, total))
        actual = set(os.listdir(os.path.join(REPO, "tests_out", subdir)))
        actual.discard("arena.ppm")
        assert actual == expected, (subdir, sorted(actual - expected),
                                    sorted(expected - actual))

    for d in ("fuzz", "fuzz_v2", "fuzz_resume", "fuzz_resume_v2"):
        for f in os.listdir(os.path.join(REPO, "tests_out", d)):
            if f.endswith(".diff"):
                path = os.path.join(REPO, "tests_out", d, f)
                assert os.path.getsize(path) == 0, "non-empty diff: " + path


def test_fuzz_fails_loudly_on_broken_config_generator(tmp_path):
    # A generator crash (non-numeric seed) must be a loud exit-1, not a
    # zero-config loop that reports success having tested nothing.
    if not os.access(REFBIN, os.X_OK):
        pytest.skip("reference checkout unavailable")
    proc = _run_fuzz(1, "notanumber", tmp_path, timeout=120)
    assert proc.returncode == 1, proc.stdout + proc.stderr
    assert "CONFIG GENERATION FAILED" in proc.stdout


def test_fuzz_gen_validates_before_generating():
    # A typo'd kind or a zero count must be a nonzero exit even when the
    # loop would produce no lines (validation happens BEFORE the loop).
    for argv in (["parityy", "1", "0"], ["parityy", "1", "2"],
                 ["parity", "1", "0"], ["resume", "1", "-3"],
                 ["parity2", "1", "0"], ["parity22", "1", "2"],
                 ["resume2", "1", "0"], ["resume22", "1", "2"]):
        proc = subprocess.run(
            ["python", os.path.join(REPO, "bin", "fuzz_gen.py")] + argv,
            capture_output=True, text=True, timeout=60)
        assert proc.returncode != 0, argv
        assert proc.stdout == "", argv
