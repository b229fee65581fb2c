#!/bin/bash
# Failure reporter — port of the reference's bin/failed-tests.sh, widened to
# also surface fuzz-harness failures (fuzz-parity / fuzz-resume write the
# same "Status=FAILED" marker into their .out files precisely so this
# aggregator can find them).
REPO_ROOT="$(cd "$(dirname "$0")/.." && pwd)"
if grep -l "Status=FAILED" \
    "$REPO_ROOT"/tests_out/*_mynbody.test.out \
    "$REPO_ROOT"/tests_out/fuzz/*.out \
    "$REPO_ROOT"/tests_out/fuzz_v2/*.out \
    "$REPO_ROOT"/tests_out/fuzz_resume/*.out \
    "$REPO_ROOT"/tests_out/fuzz_resume_v2/*.out 2>/dev/null; then
  exit 1
fi
echo "All tests passed."
