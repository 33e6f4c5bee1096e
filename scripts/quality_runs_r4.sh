#!/bin/bash
# Round-4 de-circularized reference-schedule quality runs (VERDICT r3
# item 2): stage-1 100k + stage-2 50k iters (train_scene.sh:3-8), res 256,
# GT from the INDEPENDENT renderer (native BVH + numpy Mitsuba GGX), the
# fixed default edge walk ON.  Torus first — it proves (or refutes) the
# round-3 edge-walk fix.  Run on the TPU chip; each scene writes
# report.json + mosaics, copied into results/ by the caller.
set -x
cd "$(dirname "$0")/.."
run_scene () {
  scene=$1; rig=$2
  timeout 18000 /opt/venv/bin/python scripts/e2e_validation.py \
    --scene $scene --rig $rig --res 256 --independent_gt \
    --stage1_iters 100000 --stage2_iters 50000 \
    --n_samples 64 --n_importance 64 \
    --out_dir exp_quality_r4_${scene} 2>&1 | stdbuf -oL grep -v WARNING
  cp exp_quality_r4_${scene}/report.json results/quality_${scene}_r4_independent.json || true
  cp exp_quality_r4_${scene}/testviews.png results/quality_${scene}_r4_testviews.png || true
}
run_scene torus hemisphere
run_scene sphere ring
run_scene blobby ring
