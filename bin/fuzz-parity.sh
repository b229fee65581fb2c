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
REFBIN="${NBODY_REF_BIN:-/root/reference/nbody/nbody-seq}"
# Overridable so test runs don't clobber the committed sweep records (whose
# .err files carry nondeterministic wall-clock timings).
OUT="${NBODY_FUZZ_OUT:-$REPO_ROOT/tests_out/fuzz}"
mkdir -p "$OUT"

if [ ! -x "$REFBIN" ]; then
  echo "SKIPPED: reference binary not found at $REFBIN"
  exit 0
fi

ARENA_SRC=$(ensure_arena)
# The reference binary mmaps its PPM argument O_RDWR (map_P6,
# nbody-seq.c:171-304) — hand it a throwaway copy, never the repo's arena.
cp "$ARENA_SRC" "$OUT/arena.ppm"

# Generate the config list up front so a broken generator (bad SEED/COUNT,
# missing python) fails loudly instead of feeding the loop zero lines and
# reporting a false green.
CFGS="$(mktemp /tmp/fuzz_configs.XXXXXX)" || exit 1
trap 'rm -f "$CFGS"' EXIT
if ! python "$(dirname "$0")/fuzz_gen.py" parity "$SEED" "$COUNT" > "$CFGS"
then
  echo "CONFIG GENERATION FAILED (seed=$SEED count=$COUNT)"
  exit 1
fi

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
  nbody_cpu "$N" 0 "$OUT/arena.ppm" "$STEPS" $FLAGS > "$base.out" 2> "$base.err"
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

if [ "$ran" -ne "$COUNT" ]; then
  echo "CONFIG COUNT MISMATCH: ran $ran of $COUNT"
  fail=1
fi

exit "$fail"
