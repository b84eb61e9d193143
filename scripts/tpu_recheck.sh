#!/usr/bin/env bash
# One-shot TPU re-verification after a code change to the hot path.
#
# Runs, in order (continuing past failures, logging everything):
#   1. headline bench (bench.py) — sustained + reference-workload rates
#   2. the integration MRR gates: four reference bars x 3 seeds, the mesh
#      2-thread bar, and the (non-reference) attention extension bar — a
#      gates failure is not necessarily a reference-parity regression;
#      read the failing test name first
#   3. large-scale train/eval benches (ml1m-shaped / items2m / mesh), then
#      the big-catalog targets (items10m / items20m_bf16) under their own
#      timeout so a cold compile cache can't starve the smaller targets
#   4. serving bench (exact + approximate streamed top-k at 10M/20M)
#   5. Mosaic-under-shard_map smoke on the real chip (training tower)
#   6. shard_map-composed serving/eval kernels on the real chip via a
#      (1,1) mesh at 10M items (sharded==unsharded exactness)
#
# Usage: scripts/tpu_recheck.sh [logdir]   (default logdir: /tmp/tpu_recheck)
# Each step is bounded with `timeout`; a down tunnel fails fast in bench.py's
# bounded backend retry rather than hanging the whole script.
set -u
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/tpu_recheck}
mkdir -p "$LOG"
overall=0

run() {
  local name=$1 tmo=$2; shift 2
  echo "=== $name ($(date -u +%H:%M:%S)) ==="
  if timeout "$tmo" "$@" >"$LOG/$name.log" 2>&1; then
    echo "OK  $name"
  else
    echo "FAIL $name (exit $?) — see $LOG/$name.log"
    overall=1
  fi
}

run bench          3600 python bench.py
run gates          5400 env SBR_RUN_INTEGRATION=1 SBR_TEST_PLATFORM=axon \
                        python -m pytest tests/test_integration_ml100k.py -s -q
run large_scale    5400 python benches/large_scale.py ml1m items2m mesh
run big_catalogs   5400 python benches/large_scale.py items10m items20m_bf16
run serving        3600 python benches/serving.py ml100k items10m items20m_bf16
run mesh_pallas    1800 python scripts/tpu_mesh_pallas_fit.py
run mesh_serving   3600 python scripts/sharded_serving_kernel_check.py

echo "=== summary ==="
tail -n 3 "$LOG"/bench.log 2>/dev/null
grep -E "passed|failed" "$LOG"/gates.log 2>/dev/null | tail -1
exit $overall
