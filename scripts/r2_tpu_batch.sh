#!/bin/bash
# Round-2 TPU measurement batch (run sequentially; one chip).
set -x
cd "$(dirname "$0")/.."
PY=/opt/venv/bin/python

echo "=== stage-1 upsample/core-precision A/B ==="
timeout 3000 $PY scripts/bench_stage1_upsample.py 3000 2>&1 | grep -v WARNING

echo "=== edge-side fallback budget sweep ==="
timeout 2400 $PY scripts/bench_sweep.py "c2f:esb=512" "c2f:esb=256" 2>&1 | grep -v WARNING

echo "=== eval render throughput ==="
timeout 2400 $PY scripts/bench_eval_render.py 2>&1 | grep -v WARNING

echo "=== headline bench ==="
timeout 2400 $PY bench.py 2>&1 | grep -v WARNING
