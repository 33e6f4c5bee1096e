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
  # up to 4 attempts: the trainers checkpoint + resume inside the out_dir,
  # so a retry after a wedged tunnel stream continues, not restarts.  A
  # watchdog kills an attempt whose log stops growing for 15 min (the
  # tunnel wedge observed this round leaves the process futex-blocked
  # forever while a fresh process works fine).
  for attempt in 1 2 3 4; do
    log=/tmp/e2e_${scene}_${attempt}.log
    rm -f "$log"; touch "$log"
    # no `timeout` wrapper: the watchdog must kill the PYTHON pid itself
    # (killing a timeout parent orphans the child); a hard minute cap
    # bounds total attempt time instead
    /opt/venv/bin/python scripts/e2e_validation.py \
      --scene $scene --rig $rig --res 256 --independent_gt \
      --stage1_iters 100000 --stage2_iters 50000 \
      --n_samples 64 --n_importance 64 \
      --out_dir exp_quality_r4_${scene} > "$log" 2>&1 &
    pid=$!
    last_size=-1; stall=0; mins=0
    while kill -0 $pid 2>/dev/null; do
      sleep 60
      mins=$((mins + 1))
      size=$(stat -c %s "$log" 2>/dev/null || echo 0)
      if [ "$size" = "$last_size" ]; then stall=$((stall + 1)); else stall=0; fi
      last_size=$size
      if [ $stall -ge 15 ] || [ $mins -ge 240 ]; then
        echo "=== watchdog: $scene attempt $attempt stalled/overran (stall=$stall mins=$mins); killing $pid ==="
        kill -9 $pid 2>/dev/null
        break
      fi
    done
    wait $pid 2>/dev/null
    grep -v WARNING "$log" | tail -40
    [ -f exp_quality_r4_${scene}/report.json ] && break
    echo "=== attempt $attempt for $scene did not finish; retrying ==="
  done
  cp exp_quality_r4_${scene}/report.json results/quality_${scene}_r4_independent.json || true
  cp exp_quality_r4_${scene}/testviews.png results/quality_${scene}_r4_testviews.png || true
}
run_scene torus hemisphere
run_scene sphere ring
run_scene blobby ring
