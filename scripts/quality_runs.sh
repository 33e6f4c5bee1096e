#!/bin/bash
# Reference-scale quality runs (ROUND_LOG gap #1): stage-1 100k iters +
# stage-2 25k iters at res 256 on sphere and blobby, via the e2e validation
# harness.  Run on the TPU chip; each scene writes report.json + mosaics.
set -x
cd "$(dirname "$0")/.."
for scene in sphere blobby; do
  timeout 14400 /opt/venv/bin/python scripts/e2e_validation.py \
    --scene $scene --res 256 \
    --stage1_iters 100000 --stage2_iters 25000 --n_samples 64 --n_importance 64 \
    --out_dir exp_quality_${scene}_r256 2>&1 | grep -v WARNING
done
