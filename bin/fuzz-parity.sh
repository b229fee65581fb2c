#!/bin/bash
# Randomized differential parity fuzz — automates the "fresh oracle" probe:
# pick COUNT seeded-random configurations, generate golden outputs from the
# REFERENCE BINARY itself (not from this engine, unlike bin/tests.sh whose
# oracle is our own --devices=1 run), and byte-diff the parity CLI through a
# randomly chosen sharding (1-D --devices, --comm=ring, or a 2-D --mesh2d).
#
#   fuzz-parity.sh [COUNT] [SEED]     (defaults: 5 configs, seed 20260818)
#
# Oracle binary: $NBODY_REF_BIN, default /root/reference/nbody/nbody-seq
# (reference driver nbody-seq.c:386-499).  Without it the script reports
# SKIPPED and exits 0 so harness callers stay green off this machine.
# Artifacts land in $NBODY_FUZZ_OUT (default tests_out/fuzz — the committed
# sweep records; point tests elsewhere to avoid clobbering them).
# Configs draw N in [2, 256] and steps in [1, 500] — small enough that the
# fp64 trig parity path stays a few seconds per run on one CPU core.
set -u
. "$(dirname "$0")/common.sh"

COUNT="${1:-5}"
SEED="${2:-20260818}"
fuzz_setup parity "$COUNT" "$SEED" fuzz   # sets REFBIN, OUT, CFGS

fail=0
ran=0
while read -r N STEPS FLAGS; do
  if ! ref=$(fuzz_oracle "$REFBIN" "$OUT/arena.ppm" "$OUT" "$N" "$STEPS"); then
    echo "ORACLE GENERATION FAILED: N=$N steps=$STEPS"
    fail=1
    continue
  fi
  ran=$((ran + 1))
  base="$OUT/fuzz_${N}_${STEPS}_$(printf '%s' "$FLAGS" | tr ' =' '__')"
  nbody_cpu "$N" 0 "$OUT/arena.ppm" "$STEPS" $FLAGS \
    < /dev/null > "$base.out" 2> "$base.err"
  if diff "$ref" "$base.out" > "$base.diff"; then
    echo "STATUS=PASSED" >> "$base.out"
    echo "PASSED N=$N steps=$STEPS $FLAGS"
  else
    # Casing matches bin/tests.sh's marker, which bin/failed-tests.sh greps.
    echo "Status=FAILED" >> "$base.out"
    echo "FAILED N=$N steps=$STEPS $FLAGS (see $base.diff)"
    fail=1
  fi
done < "$CFGS"

fuzz_check_count "$ran" "$COUNT" || fail=1
exit "$fail"
