#!/bin/bash
# Round-5 silhouette-counterweight A/B at the full reference schedule
# (VERDICT r4 next-round item 1): per scene, train ONE stage 1 (100k
# iters), then fork stage 2 (50k iters, train_scene.sh:3-8) into a
# control arm (silhouette_weight=0, reference parity — the arm that
# eroded/collapsed in round 4) and a counterweight arm
# (silhouette_weight=0.3), sharing the stage-1 checkpoint byte-for-byte.
# Independent-GT data + eval; 5k checkpoint/val cadence; chamfer
# trajectories + val-PSNR best-checkpoint selection in every report.
#
# Same watchdog harness as round 4 (quality_runs_r4.sh): the axon tunnel
# can wedge a stream mid-run; trainers checkpoint+resume inside out_dir so
# a retry continues, never restarts.
set -x
cd "$(dirname "$0")/.."

run_arm () {
  out=$1; shift
  for attempt in 1 2 3 4; do
    log=/tmp/r5_$(basename "$out")_${attempt}.log
    rm -f "$log"; touch "$log"
    /opt/venv/bin/python scripts/e2e_validation.py "$@" --out_dir "$out" > "$log" 2>&1 &
    pid=$!
    last_size=-1; stall=0; mins=0
    while kill -0 $pid 2>/dev/null; do
      sleep 60
      mins=$((mins + 1))
      size=$(stat -c %s "$log" 2>/dev/null || echo 0)
      if [ "$size" = "$last_size" ]; then stall=$((stall + 1)); else stall=0; fi
      last_size=$size
      if [ $stall -ge 15 ] || [ $mins -ge 200 ]; then
        echo "=== watchdog: $out attempt $attempt stalled/overran (stall=$stall mins=$mins); killing $pid ==="
        kill -9 $pid 2>/dev/null
        break
      fi
    done
    wait $pid 2>/dev/null
    grep -v WARNING "$log" | tail -25
    [ -f "$out/report.json" ] && break
    echo "=== attempt $attempt for $out did not finish; retrying ==="
  done
}

run_scene () {
  scene=$1; rig=$2
  common="--scene $scene --rig $rig --res 256 --independent_gt \
          --stage1_iters 100000 --stage2_iters 50000 \
          --n_samples 64 --n_importance 64"
  ctrl=exp_r5_${scene}_control
  sil=exp_r5_${scene}_sil
  run_arm "$ctrl" $common --silhouette_weight 0
  # fork: reuse the control arm's finished stage 1 verbatim
  if [ -d "$ctrl/stage1" ] && [ ! -d "$sil/stage1" ]; then
    mkdir -p "$sil"
    cp -r "$ctrl/stage1" "$sil/stage1"
  fi
  run_arm "$sil" $common --silhouette_weight 0.3
  for arm in control sil; do
    cp exp_r5_${scene}_${arm}/report.json results/quality_${scene}_r5_${arm}.json || true
    cp exp_r5_${scene}_${arm}/testviews.png results/quality_${scene}_r5_${arm}_testviews.png || true
  done
}

run_scene torus hemisphere
run_scene sphere ring
echo "=== r5 quality A/B done ==="
