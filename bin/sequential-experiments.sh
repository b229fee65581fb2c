#!/bin/bash
# Sequential experiment sweep — port of the reference's
# bin/sequential-experiments.sh: REPLICATES x N in {512,1024,4096,10000},
# 100 steps, single device, CSV NBODIES,RTIME,GFLOPS.
set -u
. "$(dirname "$0")/common.sh"

REPLICATES="${REPLICATES:-3}"
STEPS="${STEPS:-100}"
CSV="${CSV:-$REPO_ROOT/sequential-experiments.csv}"
ARENA=$(ensure_arena)

echo "NBODIES,RTIME,GFLOPS" > "$CSV"
for rep in $(seq 1 "$REPLICATES"); do
  for N in 512 1024 4096 10000; do
    echo "rep=$rep N=$N" >&2
    nbody_cpu "$N" 0 "$ARENA" "$STEPS" --run-xps --devices=1 "$@" \
      >> "$CSV" 2>/dev/null
  done
done
echo "wrote $CSV"
