#!/bin/bash
# Randomized checkpoint/resume differential fuzz — the two-leg version of
# bin/fuzz-parity.sh: leg 1 runs the engine for k steps under one randomly
# drawn sharding and checkpoints (exact .npz or Orbax directory, also drawn
# at random); leg 2 resumes that checkpoint under an INDEPENDENTLY drawn
# sharding and continues to the S-step target.  Both legs' stdout must
# byte-match the reference binary's own uninterrupted runs at k and S steps
# (reference driver nbody-seq.c:386-499) — so the state must round-trip
# save/restore, re-sharding, and the resume step accounting exactly.
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

fail=0
ran=0
while read -r N TOTAL SPLIT FMT FLAGS1 FLAGS2; do
  FLAGS1="${FLAGS1//|/ }"
  FLAGS2="${FLAGS2//|/ }"
  if ! ref_k=$(fuzz_oracle "$REFBIN" "$OUT/arena.ppm" "$OUT" "$N" "$SPLIT") \
      || ! ref_s=$(fuzz_oracle "$REFBIN" "$OUT/arena.ppm" "$OUT" "$N" "$TOTAL")
  then
    echo "ORACLE GENERATION FAILED: N=$N steps=$SPLIT/$TOTAL"
    fail=1
    continue
  fi
  ran=$((ran + 1))
  # Leg shardings go into the basename (like fuzz-parity's $FLAGS) so two
  # configs sharing (N, TOTAL, SPLIT, FMT) can't clobber each other.
  base="$OUT/resume_${N}_${SPLIT}of${TOTAL}_${FMT}_$(
    printf '%s_%s' "$FLAGS1" "$FLAGS2" | tr ' =' '__')"
  ck="$base.ck"
  [ "$FMT" = npz ] && ck="$ck.npz"
  # Register the checkpoint with the EXIT trap (fuzz_setup) so an interrupt
  # mid-config can't leave un-ignored Orbax litter in the sweep directory.
  FUZZ_SCRATCH=("$base.ck" "$base.ck.npz")
  rm -rf "$base.ck" "$base.ck.npz"

  nbody_cpu "$N" 0 "$OUT/arena.ppm" "$SPLIT" $FLAGS1 --checkpoint="$ck" \
    < /dev/null > "$base.leg1.out" 2> "$base.leg1.err"
  nbody_cpu "$N" 0 "$OUT/arena.ppm" "$TOTAL" $FLAGS2 --resume="$ck" \
    < /dev/null > "$base.out" 2> "$base.err"

  # Both diffs run unconditionally: a leg1 mismatch must not leave a stale
  # or missing leg2 diff behind the FAILED pointer.
  diff "$ref_k" "$base.leg1.out" > "$base.leg1.diff"; ok1=$?
  diff "$ref_s" "$base.out" > "$base.diff"; ok2=$?
  if [ "$ok1" -eq 0 ] && [ "$ok2" -eq 0 ]; then
    echo "STATUS=PASSED" >> "$base.out"
    echo "PASSED N=$N split=$SPLIT/$TOTAL $FMT [$FLAGS1] -> [$FLAGS2]"
  else
    # Casing matches bin/tests.sh's marker, which bin/failed-tests.sh greps.
    echo "Status=FAILED" >> "$base.out"
    echo "FAILED N=$N split=$SPLIT/$TOTAL $FMT [$FLAGS1] -> [$FLAGS2]" \
         "(see $base.diff / $base.leg1.diff)"
    fail=1
  fi
  rm -rf "$base.ck" "$base.ck.npz"  # checkpoints are large and reproducible
  FUZZ_SCRATCH=()
done < "$CFGS"

fuzz_check_count "$ran" "$COUNT" || fail=1
exit "$fail"
