# Shared harness helpers (sourced by the bin/ scripts).
# TPU-native analog of the reference's prun-based harness (bin/tests.sh etc.):
# "ranks" become --devices=K shards of the body axis; tests run on a virtual
# multi-device CPU mesh so they need no real multi-chip hardware.

REPO_ROOT="$(cd "$(dirname "${BASH_SOURCE[0]}")/.." && pwd)"
export PYTHONPATH="$REPO_ROOT${PYTHONPATH:+:$PYTHONPATH}"

NBODY="python -m parallel_nbody_tpu.cli"

# Virtual 8-device CPU mesh unless the caller picked a platform explicitly.
# NBODY_PLATFORM routes through jax.config.update inside the CLI — the
# JAX_PLATFORMS env var is ignored by some ambient platform plugins.
nbody_cpu() {
  # XLA flag parsing is last-occurrence-wins: strip any stale ambient
  # device-count flag and append ours LAST, or a leftover
  # --xla_force_host_platform_device_count=1 in the caller's environment
  # would shrink the required 8-device virtual mesh.
  local xla
  xla="$(printf '%s' "${XLA_FLAGS:-}" |
         sed -E 's/--xla_force_host_platform_device_count=[0-9]+//g')"
  NBODY_PLATFORM=cpu \
  XLA_FLAGS="$xla --xla_force_host_platform_device_count=8" \
  python -m parallel_nbody_tpu.cli "$@"
}

# Ensure an arena PPM exists (the reference ships a GIMP-made 1024x768 P6;
# we generate ours).
ensure_arena() {
  local path="${1:-$REPO_ROOT/nbody.ppm}"
  if [ ! -f "$path" ]; then
    # Status goes to stderr: callers capture this function's stdout as the
    # arena path ($(ensure_arena)), so it must stay a single line.
    python -c "
from parallel_nbody_tpu.utils import ppm
ppm.create('$path', 1024, 768)
" >&2
    echo "created $path (P6 1024x768)" >&2
  fi
  echo "$path"
}

# Cache-on-success golden-output generation from the reference binary: a
# crashed oracle run must not poison reruns (used by the fuzz harnesses).
#   fuzz_oracle REFBIN ARENA OUTDIR N STEPS   -> prints cached path; rc=1 on failure
fuzz_oracle() {
  local ref="$3/seq_${4}_${5}.out"
  if [ ! -f "$ref" ]; then
    if ! "$1" "$4" 0 "$2" "$5" 2>/dev/null > "$ref.tmp" \
        || [ ! -s "$ref.tmp" ]; then
      rm -f "$ref.tmp"
      return 1
    fi
    mv "$ref.tmp" "$ref"
  fi
  echo "$ref"
}
