#!/bin/bash
# Test sweep — port of the reference's bin/run-tests.sh: shard grid
# NP in 1..8 at N=128 (the CPU/proc dimension collapses; VPU parallelism is
# always on). Reports failures at the end.
set -u
BIN="$(dirname "$0")"
N="${N:-128}"

for NP in 1 2 3 4 5 6 7 8; do
  echo "== NP=$NP N=$N =="
  "$BIN/tests.sh" "$NP" 1 "$N" "$@"
done

"$BIN/failed-tests.sh"
