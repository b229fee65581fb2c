#!/bin/bash
# Checkpoint/resume differential fuzz, KERNEL-VARIANT axis — the resume2
# generator stream draws, per LEG, a kernel flag (trig default / --fast /
# --pallas; all three print byte-identical fp64 output, proven by the
# recorded NP-grid and the parity-v2 sweep) on top of the leg's sharding.
# Because the legs draw independently, checkpoints written under one kernel
# get resumed under another — a checkpoint must be kernel-agnostic STATE,
# and every cross-kernel hand-off must still byte-match the reference
# binary's uninterrupted runs at both step counts.  The loop itself is
# fuzz_resume_loop in bin/common.sh, shared with bin/fuzz-resume.sh.
#
#   fuzz-resume-v2.sh [COUNT] [SEED]   (defaults: 5 configs, seed 20260818)
#
# Oracle binary: $NBODY_REF_BIN, default /root/reference/nbody/nbody-seq
# (reference driver nbody-seq.c:386-499).  Without it the script reports
# SKIPPED and exits 0 so harness callers stay green off this machine.
# Artifacts land in $NBODY_FUZZ_OUT (default tests_out/fuzz_resume_v2 —
# the committed sweep records; point tests elsewhere to avoid clobbering
# them).
set -u
. "$(dirname "$0")/common.sh"

COUNT="${1:-5}"
SEED="${2:-20260818}"
fuzz_setup resume2 "$COUNT" "$SEED" fuzz_resume_v2   # sets REFBIN, OUT, CFGS

fuzz_resume_loop "$COUNT"
exit "$?"
