#!/bin/bash
# Final-slot blobby run (VERDICT r4 item 7's missing scene), silhouette
# default 0.3, independent GT.  Schedule sized to the remaining round
# time; pass stage1/stage2 iters as $1/$2 (default 100000/25000).
cd "$(dirname "$0")/.."
S1=${1:-100000}; S2=${2:-25000}
/opt/venv/bin/python scripts/e2e_validation.py \
  --scene blobby --rig ring --res 256 --independent_gt \
  --stage1_iters $S1 --stage2_iters $S2 \
  --n_samples 64 --n_importance 64 --silhouette_weight 0.3 \
  --out_dir exp_r5_blobby_sil 2>&1 | grep -v WARNING
cp exp_r5_blobby_sil/report.json results/quality_blobby_r5_sil.json || true
cp exp_r5_blobby_sil/testviews.png results/quality_blobby_r5_sil_testviews.png || true
