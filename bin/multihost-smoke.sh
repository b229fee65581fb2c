#!/bin/bash
# Multi-host smoke launch — the prun/mpirun analog, runnable on one machine:
# NPROCS local processes join a gloo-backed jax.distributed runtime (2
# virtual CPU devices each), build the global body mesh, run the real
# sharded step (allgather + ring), and verify every shard against the
# single-device oracle.  Usage: multihost-smoke.sh [NPROCS] [PORT]
set -u
. "$(dirname "$0")/common.sh"

NPROCS="${1:-2}"
PORT="${2:-9876}"

pids=()
for PID in $(seq 0 $((NPROCS - 1))); do
  python -m parallel_nbody_tpu.parallel.multihost_smoke \
    "$PID" "$NPROCS" "$PORT" &
  pids+=($!)
done

rc=0
for p in "${pids[@]}"; do
  wait "$p" || rc=1
done
if [ "$rc" -eq 0 ]; then
  echo "multihost smoke: ALL $NPROCS PROCESSES OK"
else
  echo "multihost smoke: FAILED" >&2
fi
exit "$rc"
