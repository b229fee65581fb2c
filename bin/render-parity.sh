#!/bin/bash
# Renderer parity against the REFERENCE BINARY's actual rendered frames.
#
# Every other golden diff in this harness compares the printed body table;
# this one byte-compares the PPM the reference binary itself mutates.  The
# reference renders a frame whenever a whole second more than secs_per_update
# has elapsed (nbody-seq.c:466-471) and display() overwrites EVERY pixel
# (black for empty space, nbody-seq.c:327-355), so the final PPM is exactly
# the render of the last state that triggered a frame.  At N=10000
# (MAXBODIES) a step takes seconds on this class of CPU for BOTH engines, so
# with secs_per_update=1 every step — including the last — triggers a frame
# deterministically, and the final PPM bytes must agree: render(state after
# STEPS steps) through the reference's doubles vs our fp64 trig engine + the
# native mmap blit (native/nbody_host.cpp).
#
#   render-parity.sh [STEPS] [FLAGS...]   (default: 3 steps, single device;
#                                          FLAGS, e.g. --devices=4, select a
#                                          sharded engine path — frames then
#                                          render from gathered shard state
#                                          on an 8-virtual-device CPU mesh)
#
# Oracle binary: $NBODY_REF_BIN, default /root/reference/nbody/nbody-seq.
# Without it the script reports SKIPPED and exits 0.  Artifacts land in
# $NBODY_RENDER_OUT (default tests_out/render_parity — committed records;
# point test runs elsewhere), one file set per (STEPS, FLAGS) config.  The
# arena is a small 128x96 P6 so the reference's O(pixels*bodies) rasterizer
# stays a fraction of the step time.
set -u
. "$(dirname "$0")/common.sh"

STEPS="${1:-3}"
case "$STEPS" in
  ''|*[!0-9]*|0)
    # A flags-only invocation (`render-parity.sh --devices=4`) must not
    # silently become a 0-step single-device run recorded as PASSED.
    echo "usage: render-parity.sh [STEPS >= 1] [FLAGS...] (got STEPS='$STEPS')"
    exit 2 ;;
esac
[ "$#" -gt 0 ] && shift
FLAGS=("$@")
N=10000
REFBIN="${NBODY_REF_BIN:-/root/reference/nbody/nbody-seq}"
OUT="${NBODY_RENDER_OUT:-$REPO_ROOT/tests_out/render_parity}"
mkdir -p "$OUT"

if [ ! -x "$REFBIN" ]; then
  echo "SKIPPED: reference binary not found at $REFBIN"
  exit 0
fi

TAG="s${STEPS}$(printf '%s' "${FLAGS[*]:-}" | tr -d ' ' | tr '=-' '__')"

# Any early exit below must not leave a stale PASSED from a previous run
# beside freshly overwritten artifacts.
echo "STATUS=FAILED" > "$OUT/STATUS_$TAG"

# Blank 128x96 P6 arena; each engine gets its own copy (both mutate it —
# the reference mmaps O_RDWR, ours blits through native/libnbody_host.so).
python - "$OUT/ref_$TAG.ppm" "$OUT/ours_$TAG.ppm" <<'PY' || exit 1
import shutil, sys
from parallel_nbody_tpu.utils import ppm
ppm.create(sys.argv[1], 128, 96)
shutil.copy(sys.argv[1], sys.argv[2])
PY

fail=0
"$REFBIN" "$N" 1 "$OUT/ref_$TAG.ppm" "$STEPS" \
  > "$OUT/ref_$TAG.out" 2> "$OUT/ref_$TAG.err" \
  || { echo "REFERENCE RUN FAILED"; exit 1; }
# Parity configuration: CPU fp64 trig (the CLI defaults); nbody_cpu provides
# the 8-virtual-device CPU mesh so --devices/--mesh2d FLAGS shard for real.
nbody_cpu "$N" 1 "$OUT/ours_$TAG.ppm" "$STEPS" ${FLAGS[@]+"${FLAGS[@]}"} \
  > "$OUT/ours_$TAG.out" 2> "$OUT/ours_$TAG.err" \
  || { echo "ENGINE RUN FAILED (see $OUT/ours_$TAG.err)"; exit 1; }

# Enforce the determinism premise before trusting the byte-diff: both
# engines render on their own wall clock, so every step must take well over
# secs_per_update=1 s (integer-second elapsed check) on BOTH engines or one
# may skip the final frame.  ~2 s/step average is the safe proxy; on a box
# fast enough to break it the comparison is INCONCLUSIVE, not failed.
ref_t=$(sed -n 's/.*N-body took: \([0-9.]*\) seconds.*/\1/p' "$OUT/ref_$TAG.err")
our_t=$(sed -n 's/.*N-body took: \([0-9.]*\) seconds.*/\1/p' "$OUT/ours_$TAG.err")
if [ -z "$ref_t" ] || [ -z "$our_t" ] || \
   ! awk -v r="$ref_t" -v o="$our_t" -v s="$STEPS" \
       'BEGIN { exit !(r/s >= 2.0 && o/s >= 2.0) }'; then
  echo "SKIPPED: cadence premise unmet (ref ${ref_t:-?} s, ours ${our_t:-?} s for $STEPS steps; need >= 2 s/step both)"
  echo "STATUS=SKIPPED" > "$OUT/STATUS_$TAG"
  exit 0
fi

if cmp -s "$OUT/ref_$TAG.ppm" "$OUT/ours_$TAG.ppm"; then
  echo "PASSED ppm N=$N steps=$STEPS ${FLAGS[*]:-} ($(md5sum < "$OUT/ref_$TAG.ppm" | cut -d' ' -f1))"
else
  echo "FAILED ppm: rendered frames differ (cmp $OUT/ref_$TAG.ppm $OUT/ours_$TAG.ppm)"
  fail=1
fi
if diff "$OUT/ref_$TAG.out" "$OUT/ours_$TAG.out" > "$OUT/stdout_$TAG.diff"; then
  echo "PASSED stdout"
else
  echo "FAILED stdout (see $OUT/stdout_$TAG.diff)"
  fail=1
fi
[ "$fail" -eq 0 ] && echo "STATUS=PASSED" > "$OUT/STATUS_$TAG" \
                  || echo "STATUS=FAILED" > "$OUT/STATUS_$TAG"

exit "$fail"
