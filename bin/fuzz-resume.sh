#!/bin/bash
# Randomized checkpoint/resume differential fuzz — the two-leg version of
# bin/fuzz-parity.sh: leg 1 runs the engine for k steps under one randomly
# drawn sharding and checkpoints (exact .npz or Orbax directory, also drawn
# at random); leg 2 resumes that checkpoint under an INDEPENDENTLY drawn
# sharding and continues to the S-step target.  Both legs' stdout must
# byte-match the reference binary's own uninterrupted runs at k and S steps
# (reference driver nbody-seq.c:386-499) — so the state must round-trip
# save/restore, re-sharding, and the resume step accounting exactly.
# (The loop itself is fuzz_resume_loop in bin/common.sh, shared with the
# kernel-variant-axis stream, bin/fuzz-resume-v2.sh.)
#
#   fuzz-resume.sh [COUNT] [SEED]     (defaults: 5 configs, seed 20260818)
#
# Oracle binary: $NBODY_REF_BIN, default /root/reference/nbody/nbody-seq.
# Without it the script reports SKIPPED and exits 0 so harness callers stay
# green off this machine.  Artifacts land in $NBODY_FUZZ_OUT (default
# tests_out/fuzz_resume — the committed sweep records; point tests elsewhere
# to avoid clobbering them).  Steps stay small: each config costs THREE fp64
# trig runs (reference oracle + two engine legs).
set -u
. "$(dirname "$0")/common.sh"

COUNT="${1:-5}"
SEED="${2:-20260818}"
fuzz_setup resume "$COUNT" "$SEED" fuzz_resume   # sets REFBIN, OUT, CFGS

fuzz_resume_loop "$COUNT"
exit "$?"
