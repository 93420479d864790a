#!/bin/bash
# One-shot r4 measurement sweep for when the axon tunnel is reachable.
# Captures everything PERF.md is waiting on, in priority order, with
# per-step timeouts so one hang doesn't eat the window.
# Usage: bash tools/r4_chip_sweep.sh [outdir]
set -u
OUT=${1:-/tmp/r4_sweep}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

run() {  # run <name> <timeout_s> <cmd...>
  local name=$1 t=$2; shift 2
  echo "=== $name ==="
  timeout "$t" "$@" > "$OUT/$name.log" 2>&1
  echo "rc=$? ($name)"; tail -2 "$OUT/$name.log" | grep -vE "WARNING|cpu_aot" || true
}

# 0. is the chip alive at all?
timeout 180 python -c "
import numpy as np, jax, jax.numpy as jnp
print('alive', float(np.asarray(jax.device_get(jnp.ones((2,2))+1))[0,0]))" \
  || { echo 'TUNNEL STILL DOWN'; exit 1; }

# 1. headline at HEAD (the PERF.md reconciliation number)
run bench_avia 900 python bench.py
# 2b. batch-serving aggregate throughput
run bench_batch4 1200 python bench.py avia_batch4
# 3. the other envelope scenarios
run bench_mid360 900 python bench.py mid360
run bench_velodyne 900 python bench.py velodyne_outdoor
run bench_ouster 1200 python bench.py ouster64
# 4. stage table (fixed insert row) + sharding intercept
run profile_avia 900 python tools/profile_stages.py avia
run scaling_intercept 1200 python tools/bench_scaling.py
# 5. per-search kNN backend microbench (keep-vs-demote evidence)
run knn_micro_avia 900 python tools/microbench_grouped.py avia
run knn_micro_sparse 900 python tools/microbench_grouped.py sparse
echo "sweep done -> $OUT"
