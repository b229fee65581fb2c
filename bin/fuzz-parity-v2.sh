#!/bin/bash
# Randomized differential parity fuzz, VARIANT + PROCESS axes (VERDICT r4
# #3) — the parity2 generator stream additionally draws the kernel flag
# (trig default / --fast / --pallas; all three print byte-identical fp64
# output) and a process count: PROCS=2 configs run the full CLI under the
# 2-process jax.distributed launcher (bin/multihost-cli.sh — --devices=4
# over the global gloo mesh, 2 virtual CPU devices per process) so the
# distributed runtime's rank-0 output is byte-diffed against the reference
# binary, not just grid-tested at N=128 (bin/run-tests.sh).
#
#   fuzz-parity-v2.sh [COUNT] [SEED]     (defaults: 5 configs, seed 20260818)
#
# Oracle binary: $NBODY_REF_BIN, default /root/reference/nbody/nbody-seq
# (reference driver nbody-seq.c:386-499).  Without it the script reports
# SKIPPED and exits 0 so harness callers stay green off this machine.
# Artifacts land in $NBODY_FUZZ_OUT (default tests_out/fuzz_v2 — the
# committed sweep records; point tests elsewhere to avoid clobbering them).
set -u
. "$(dirname "$0")/common.sh"

COUNT="${1:-5}"
SEED="${2:-20260818}"
fuzz_setup parity2 "$COUNT" "$SEED" fuzz_v2   # sets REFBIN, OUT, CFGS

fail=0
ran=0
idx=0
while read -r N STEPS PROCS FLAGS; do
  idx=$((idx + 1))
  if ! ref=$(fuzz_oracle "$REFBIN" "$OUT/arena.ppm" "$OUT" "$N" "$STEPS"); then
    echo "ORACLE GENERATION FAILED: N=$N steps=$STEPS"
    fail=1
    continue
  fi
  ran=$((ran + 1))
  base="$OUT/fuzz_${N}_${STEPS}_p${PROCS}_$(printf '%s' "$FLAGS" | tr ' =' '__')"
  if [ "$PROCS" -eq 1 ]; then
    nbody_cpu "$N" 0 "$OUT/arena.ppm" "$STEPS" $FLAGS \
      < /dev/null > "$base.out" 2> "$base.err"
  else
    # Multi-process leg: a per-config port sidesteps TIME_WAIT collisions
    # between back-to-back coordinator binds.  multihost-cli.sh supplies
    # the arena (same 1024x768 P6 as $OUT's copy) and the --devices flag.
    PORT=$((11000 + idx)) bash "$REPO_ROOT/bin/multihost-cli.sh" \
      "$PROCS" "$N" "$STEPS" $FLAGS \
      < /dev/null > "$base.out" 2> "$base.err"
  fi
  if diff "$ref" "$base.out" > "$base.diff"; then
    echo "STATUS=PASSED" >> "$base.out"
    echo "PASSED N=$N steps=$STEPS p=$PROCS $FLAGS"
  else
    # Casing matches bin/tests.sh's marker, which bin/failed-tests.sh greps.
    echo "Status=FAILED" >> "$base.out"
    echo "FAILED N=$N steps=$STEPS p=$PROCS $FLAGS (see $base.diff)"
    fail=1
  fi
done < "$CFGS"

fuzz_check_count "$ran" "$COUNT" || fail=1
exit "$fail"
