#!/bin/bash
# Single golden-diff test — TPU-native port of the reference's bin/tests.sh:
#   tests.sh NP CPUS N
# lazily generates tests/${N}_MY_REF_OUTPUT from the single-device engine
# (1000 steps), then runs the sharded engine with NP shards and diffs.
# CPUS is kept for interface parity (the reference's OpenMP threads/proc);
# intra-chip parallelism is always on.
set -u
. "$(dirname "$0")/common.sh"

NP="${1:?usage: tests.sh NP CPUS N}"
CPUS="${2:?usage: tests.sh NP CPUS N}"
N="${3:?usage: tests.sh NP CPUS N}"
STEPS="${STEPS:-1000}"

ARENA=$(ensure_arena)
mkdir -p "$REPO_ROOT/tests_out"
REF="$REPO_ROOT/tests_out/${N}_MY_REF_OUTPUT"
BASE="$REPO_ROOT/tests_out/${NP}_${CPUS}_${N}_mynbody.test"

if [ ! -f "$REF" ]; then
  nbody_cpu "$N" 0 "$ARENA" "$STEPS" --devices=1 > "$REF" 2>/dev/null
fi

nbody_cpu "$N" 0 "$ARENA" "$STEPS" --devices="$NP" > "$BASE.out" 2> "$BASE.err"
if diff "$REF" "$BASE.out" > "$BASE.diff"; then
  echo "STATUS=PASSED" >> "$BASE.out"
else
  echo "Status=FAILED" >> "$BASE.out"
fi
