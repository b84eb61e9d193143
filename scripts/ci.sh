#!/usr/bin/env bash
# CI gate — one command reproducing the repo's full evidence set
# (the reference wires its MRR-bar tests into CI, .travis.yml:1-10).
#
#   scripts/ci.sh          # unit suite + quickstart + multichip dryrun (CPU)
#   scripts/ci.sh --tpu    # + the four ML-100K MRR bars and bench.py on the
#                          #   real chip (requires the axon TPU backend)
#
# Fails on the first regression. From any cwd.

set -euo pipefail
cd "$(dirname "$0")/.."

echo "== unit suite (CPU, 8 virtual devices; includes the 2-process"
echo "   jax.distributed test and the sharded-pallas parity tests)"
python -m pytest tests/ -q

echo "== quickstart example (the reference doc-tests its README example,"
echo "   src/lib.rs:22-58; forced CPU so the CPU gate is hermetic during"
echo "   tunnel outages — the --tpu path re-runs real-chip workloads)"
JAX_PLATFORMS=cpu python examples/quickstart.py

echo "== multichip dryrun (8 virtual CPU devices)"
JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    python -c "import __graft_entry__ as g; g.dryrun_multichip(8)"

if [[ "${1:-}" == "--tpu" ]]; then
    echo "== shard_map+Pallas on the REAL chip (data=1, model=1 mesh):"
    echo "   compiles the Mosaic LSTM kernel under shard_map for real"
    echo "   instead of interpret mode (VERDICT r2 item 6)"
    python scripts/tpu_mesh_pallas_fit.py

    echo "== ML-100K MRR bars (real TPU; includes the mesh-run 2-thread bar)"
    SBR_RUN_INTEGRATION=1 SBR_TEST_PLATFORM=axon \
        python -m pytest tests/test_integration_ml100k.py -s -q

    echo "== headline bench"
    python bench.py
fi

echo "CI gate: ALL GREEN"
