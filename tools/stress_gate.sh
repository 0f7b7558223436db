#!/usr/bin/env bash
# Committed oracle stress gate (r4 verdict ask #5): the sf0.1 + odd-CPU
# runs caught two real boundary bugs in round 4 (session_window closed
# boundary, IVF nprobe scaling — commit e04ad6b), so they are a gate,
# not a recipe. One command runs all three:
#   1. sf0.01, 32 cpus  — the driver-equivalent correctness gate
#   2. sf0.1,  32 cpus  — 10x data: flushes boundary/scale bugs
#   3. sf0.01,  7 cpus  — odd parallelism: flushes partition-count
#                         assumptions (non-power-of-2, < groups)
# Usage: tools/stress_gate.sh [--quick]   (--quick = sf0.01 only)
set -uo pipefail
cd "$(dirname "$0")/.."

FAILED=0
run_gate() {
  local sf_dir="$1" cpus="$2" out="$3"
  echo "=== gate: $sf_dir cpus=$cpus -> $out"
  SPARK_GRAFT_CPUS="$cpus" sbt -batch \
    "runMain graft.Verify $sf_dir $out" 2>&1 | grep -E "\[verify\]" || true
  # every leg runs even if an earlier one fails — a boundary bug caught
  # at sf0.1 must not hide an order-dependence bug at cpus=7
  if ! python3 tools/compare.py "$sf_dir" "$out" | tail -4; then
    FAILED=1
  fi
}

run_gate /root/testdata/sf0.01 32 /tmp/gate_sf001
if [[ "${1:-}" != "--quick" ]]; then
  run_gate /root/testdata/sf0.1  32 /tmp/gate_sf01
  run_gate /root/testdata/sf0.01  7 /tmp/gate_cpu7
fi
echo "=== stress gate complete (failed=$FAILED)"
exit "$FAILED"
