#!/bin/bash
# Blobby re-run for the round-5 final slot (first attempt was killed by a
# stuck-process misdiagnosis at stage-1 iter ~7.8k with no checkpoint on
# disk yet).  Line-buffered logging so progress is visible live.
set -u
cd "$(dirname "$0")/.."
S1=${1:-18000}; S2=${2:-6000}
echo "=== blobby $S1/$S2 ($(date -u +%H:%M:%S)) ==="
stdbuf -oL -eL /opt/venv/bin/python -u scripts/e2e_validation.py \
  --scene blobby --rig ring --res 256 --independent_gt \
  --stage1_iters "$S1" --stage2_iters "$S2" \
  --n_samples 64 --n_importance 64 --silhouette_weight 0.3 \
  --out_dir exp_r5_blobby_sil 2>&1 | stdbuf -oL grep -v WARNING
cp exp_r5_blobby_sil/report.json results/quality_blobby_r5_sil.json || true
cp exp_r5_blobby_sil/testviews.png results/quality_blobby_r5_sil_testviews.png || true
echo "=== done ($(date -u +%H:%M:%S)) ==="
