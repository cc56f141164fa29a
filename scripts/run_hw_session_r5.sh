#!/bin/bash
# Round-5 TPU hardware session: run every validation/benchmark that needs
# the real chip, sequentially (SINGLE tunnel client at a time), each under
# its own timeout with its own log + JSON artifact.  Run from the repo
# root: bash scripts/run_hw_session_r5.sh [outdir]
set -u
OUT=${1:-scripts}
cd "$(dirname "$0")/.."

probe() {
  timeout 900 python -c "
import time, jax, jax.numpy as jnp
t0=time.time()
jax.devices()
print('probe ok', round(time.time()-t0,1), 's', flush=True)
print('sum', float(jnp.sum(jnp.ones(8))), flush=True)
" 2>&1 | grep -vE "WARNING"
}

echo "== tunnel probe"; probe || { echo "TUNNEL DOWN — aborting"; exit 1; }

run() {  # run <name> <timeout_s> <cmd...>
  local name=$1 t=$2; shift 2
  echo "== $name ($(date +%H:%M:%S))"
  timeout "$t" "$@" > "$OUT/data_${name}_r5.json" 2> "$OUT/log_${name}_r5.txt"
  local rc=$?
  echo "   rc=$rc  $(tail -c 300 "$OUT/data_${name}_r5.json" 2>/dev/null)"
}

# fused-kernel numerics incl. the round-5 batched-table case
run validate_fused_r5 3000 python scripts/validate_fused_hw.py \
    gerd_smooth gerd_gated batched_table batched_full_hbm
# storage paths incl. the round-5 both-ends case
run validate_storage_r5 3000 python scripts/validate_qlat_hw.py storage
# network kernels incl. both-ends / table-rating / power-rating cases
run validate_network_r5 3600 python scripts/validate_fused_network_hw.py \
    serial_split gerd_tributary junction_table junction_power \
    branch_both_ends
# adjoint gradient speed (fixed vs implicit vs fused-forward)
run bench_adjoint 3600 python scripts/bench_adjoint.py
# persistent compile cache: two fresh processes, the second should load
echo "== compile-cache second-process measurement"
run bench_headline_1 3000 python bench.py
run bench_headline_2 3000 python bench.py
# large dendritic basin on the stacked engine (pcr_f32)
run bench_basin_large 3600 python scripts/bench_basin_large.py 9 197
echo "== done ($(date +%H:%M:%S))"
