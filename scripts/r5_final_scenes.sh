#!/bin/bash
# Round-5 final-slot scene-matrix runs (VERDICT r4 item 7): blobby (the
# missing round-4 scene) then the genus-2 pretzel (the harder non-convex
# stand-in for dragon), both against the independent GT renderer with the
# decided silhouette default (0.3).  Schedules are sized to the remaining
# session wall-clock (pass S1/S2 per scene to override); the quality
# chain checkpoints+resumes per stage, so a timeout leaves a resumable
# run and a partial report.
set -u
cd "$(dirname "$0")/.."
PY=/opt/venv/bin/python

B1=${1:-26000}; B2=${2:-8000}     # blobby stage1/stage2 iters
G1=${3:-16000}; G2=${4:-6000}     # genus2 stage1/stage2 iters

echo "=== blobby $B1/$B2 ($(date -u +%H:%M:%S)) ==="
$PY scripts/e2e_validation.py \
  --scene blobby --rig ring --res 256 --independent_gt \
  --stage1_iters "$B1" --stage2_iters "$B2" \
  --n_samples 64 --n_importance 64 --silhouette_weight 0.3 \
  --out_dir exp_r5_blobby_sil 2>&1 | grep -v WARNING
cp exp_r5_blobby_sil/report.json results/quality_blobby_r5_sil.json || true
cp exp_r5_blobby_sil/testviews.png results/quality_blobby_r5_sil_testviews.png || true

echo "=== genus2 $G1/$G2 ($(date -u +%H:%M:%S)) ==="
$PY scripts/e2e_validation.py \
  --scene genus2 --rig hemisphere --res 256 --independent_gt \
  --stage1_iters "$G1" --stage2_iters "$G2" \
  --n_samples 64 --n_importance 64 --silhouette_weight 0.3 \
  --out_dir exp_r5_genus2_sil 2>&1 | grep -v WARNING
cp exp_r5_genus2_sil/report.json results/quality_genus2_r5_sil.json || true
cp exp_r5_genus2_sil/testviews.png results/quality_genus2_r5_sil_testviews.png || true
echo "=== done ($(date -u +%H:%M:%S)) ==="
