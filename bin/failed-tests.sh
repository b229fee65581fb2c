#!/bin/bash
# Failure reporter — port of the reference's bin/failed-tests.sh.
REPO_ROOT="$(cd "$(dirname "$0")/.." && pwd)"
if grep -l "Status=FAILED" "$REPO_ROOT"/tests_out/*_mynbody.test.out 2>/dev/null; then
  exit 1
fi
echo "All tests passed."
