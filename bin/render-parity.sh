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
#   render-parity.sh [STEPS]          (default: 3)
#
# Oracle binary: $NBODY_REF_BIN, default /root/reference/nbody/nbody-seq.
# Without it the script reports SKIPPED and exits 0.  Artifacts land in
# $NBODY_RENDER_OUT (default tests_out/render_parity — committed records;
# point test runs elsewhere).  The arena is a small 128x96 P6 so the
# reference's O(pixels*bodies) rasterizer stays a fraction of the step time.
set -u
. "$(dirname "$0")/common.sh"

STEPS="${1:-3}"
N=10000
REFBIN="${NBODY_REF_BIN:-/root/reference/nbody/nbody-seq}"
OUT="${NBODY_RENDER_OUT:-$REPO_ROOT/tests_out/render_parity}"
mkdir -p "$OUT"

if [ ! -x "$REFBIN" ]; then
  echo "SKIPPED: reference binary not found at $REFBIN"
  exit 0
fi

# Blank 128x96 P6 arena; each engine gets its own copy (both mutate it —
# the reference mmaps O_RDWR, ours blits through native/libnbody_host.so).
python -c "
from parallel_nbody_tpu.utils import ppm
ppm.create('$OUT/ref.ppm', 128, 96)
import shutil; shutil.copy('$OUT/ref.ppm', '$OUT/ours.ppm')
" || exit 1

fail=0
"$REFBIN" "$N" 1 "$OUT/ref.ppm" "$STEPS" > "$OUT/ref.out" 2> "$OUT/ref.err" \
  || { echo "REFERENCE RUN FAILED"; exit 1; }
# Parity configuration: single device, CPU fp64 trig (the CLI defaults).
NBODY_PLATFORM=cpu python -m parallel_nbody_tpu.cli \
  "$N" 1 "$OUT/ours.ppm" "$STEPS" > "$OUT/ours.out" 2> "$OUT/ours.err" \
  || { echo "ENGINE RUN FAILED (see $OUT/ours.err)"; exit 1; }

if cmp -s "$OUT/ref.ppm" "$OUT/ours.ppm"; then
  echo "PASSED ppm N=$N steps=$STEPS ($(md5sum < "$OUT/ref.ppm" | cut -d' ' -f1))"
else
  echo "FAILED ppm: rendered frames differ (cmp $OUT/ref.ppm $OUT/ours.ppm)"
  fail=1
fi
if diff "$OUT/ref.out" "$OUT/ours.out" > "$OUT/stdout.diff"; then
  echo "PASSED stdout"
else
  echo "FAILED stdout (see $OUT/stdout.diff)"
  fail=1
fi
[ "$fail" -eq 0 ] && echo "STATUS=PASSED" > "$OUT/STATUS" || echo "STATUS=FAILED" > "$OUT/STATUS"

exit "$fail"
