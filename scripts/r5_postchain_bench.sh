#!/bin/bash
# Runs after the round-5 quality chain frees the chip: the {mat_bf16,
# shade_pallas} matrix, the trace_pallas A/B, and a quiesced bench.py.
# Usage: bash scripts/r5_postchain_bench.sh <chain_pid>
cd "$(dirname "$0")/.."
pid=$1
while kill -0 "$pid" 2>/dev/null; do sleep 60; done
echo "=== chain $pid done; starting benches $(date) ==="
timeout 2400 /opt/venv/bin/python scripts/bench_mat_bf16.py 2>&1 | grep -v WARNING
echo "=== mat_bf16 matrix done rc=$? $(date) ==="
timeout 2400 /opt/venv/bin/python scripts/bench_trace_pallas.py 2>&1 | grep -v WARNING
echo "=== trace_pallas done rc=$? $(date) ==="
timeout 2400 /opt/venv/bin/python bench.py 2>&1 | grep -v WARNING | tail -2
echo "=== bench done rc=$? $(date) ==="
