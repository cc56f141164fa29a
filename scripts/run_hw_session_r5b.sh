#!/bin/bash
# Round-5 TPU hardware session, prioritized to fit the round's wall clock.
# Order: headline bench (also populates the persistent compile cache for
# the driver's end-of-round run), then the round-5 kernel-path validations,
# then the adjoint gradient bench.  SINGLE tunnel client at a time.
set -u
OUT=${1:-scripts}
cd "$(dirname "$0")/.."

run() {  # run <name> <timeout_s> <cmd...>
  local name=$1 t=$2; shift 2
  echo "== $name ($(date +%H:%M:%S))"
  timeout "$t" "$@" > "$OUT/data_${name}_r5.json" 2> "$OUT/log_${name}_r5.txt"
  local rc=$?
  echo "   rc=$rc  $(tail -c 300 "$OUT/data_${name}_r5.json" 2>/dev/null)"
}

run bench_headline_1 1800 python bench.py
run validate_fused_r5 1200 python scripts/validate_fused_hw.py \
    gerd_smooth gerd_gated batched_table
run validate_network_r5 1200 python scripts/validate_fused_network_hw.py \
    junction_table junction_power branch_both_ends
run bench_adjoint 900 python scripts/bench_adjoint.py
run bench_headline_2 900 python bench.py
echo "== done ($(date +%H:%M:%S))"
