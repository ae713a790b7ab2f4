#!/bin/bash
# Round-5 chip chain (adapted from scripts/chip_queue/round5.sh for the
# post-reboot environment: corpus re-render + gate overlap).
cd /root/repo
LOG=/tmp/queue.log
echo "$(date) chip_r5 queue starts" >> $LOG

wait_marker() { # pattern file max_minutes
  local i
  for i in $(seq 1 "$3"); do
    grep -q "$1" "$2" 2>/dev/null && return 0
    sleep 60
  done
  return 1
}

# ---- stage 1: wait for the v3 gate process, promote on win ----
for PID in $(cat /tmp/gate_v3.pid 2>/dev/null); do
  while kill -0 "$PID" 2>/dev/null; do sleep 30; done
done
python - >> $LOG 2>&1 <<'PYEOF'
import json, shutil
try:
    r = json.load(open('outputs/train_r5/gate_vfimamba_v3.json'))
except Exception as e:
    print('stage1: no gate record:', e)
else:
    print('stage1 gate decision:', r.get('decision'), r.get('candidate_psnr_db'),
          'vs', r.get('incumbent_psnr_db'))
    if str(r.get('decision', '')).startswith('kept'):
        shutil.copy('weights/vfimamba_v3.npz', 'weights/vfimamba.npz')
        print('promoted v3 -> weights/vfimamba.npz')
PYEOF
echo "$(date) stage1 done" >> $LOG

# ---- stage 2: full router calibration on-chip (scene gate kept) ----
wait_marker CALIB_SMOOTH_DONE /tmp/render_r5.log 60 || echo "$(date) stage2: calib clips TIMEOUT" >> $LOG
CALIB_CLIPS="data/raw/synth_calib.mp4,data/raw/synth_calib_routing.mp4,data/raw/synth_calib_smooth.mp4"
timeout 7200 python scripts/calibrate_router.py --skip-scene-gate \
  --clip "$CALIB_CLIPS" --native-clips "$CALIB_CLIPS" \
  --pairs 40 --stride 4 --native-pairs 30 \
  > /tmp/calibrate_r5.log 2>&1
echo "$(date) stage2 calibrate done rc=$?" >> $LOG
echo "weights/router_gate.json" >> /tmp/gates_todo

# ---- stage 3: 13-model benchmark refresh (atomic — do not kill) ----
wait_marker PREP_SMOOTH1_DONE /tmp/render_r5.log 90 || echo "$(date) stage3: processed clips TIMEOUT" >> $LOG
timeout 10800 python benchmark.py -d data/processed -o outputs/benchmarks \
  --max-triplets 8 > /tmp/benchmark_r5.log 2>&1
echo "$(date) stage3 benchmark done rc=$?" >> $LOG
echo "outputs/benchmarks/benchmark_results.json" >> /tmp/gates_todo

# ---- stage 4: ordering study rerun (fixed GT indexing, 3 families) ----
timeout 5400 python scripts/lpips_ordering_study.py --pairs 40 --stride 5 \
  > /tmp/ordering_r5.log 2>&1
echo "$(date) stage4 ordering done rc=$?" >> $LOG
echo "outputs/lpips_ordering.json" >> /tmp/gates_todo

# ---- stage 5: sweep refresh — quality-aware adaptive rows ----
wait_marker EXTRACT_DONE /tmp/extract_r5.log 60 || echo "$(date) stage5: intervals TIMEOUT" >> $LOG
timeout 3600 python scripts/run_experiments.py --clip synth_hard_001 \
  --intervals 0,1 --heavy --replace --experiment adaptive_aggressive \
  >> /tmp/sweep_r5.log 2>&1
echo "$(date) stage5a done rc=$?" >> $LOG
timeout 3600 python scripts/run_experiments.py --clip synth_hard_002 \
  --intervals 0,1 --heavy --replace --experiment adaptive_aggressive \
  >> /tmp/sweep_r5.log 2>&1
echo "$(date) stage5b done rc=$?" >> $LOG
timeout 3600 python scripts/run_experiments.py --clip synth_001 \
  --intervals 0,1,2 --heavy --replace --experiment adaptive_aggressive \
  >> /tmp/sweep_r5.log 2>&1
echo "$(date) stage5c done rc=$?" >> $LOG

# ---- stage 6: analysis regen + deploy (bounded) ----
timeout 1800 python scripts/generate_comprehensive_report.py >> $LOG 2>&1
timeout 1800 python scripts/compare_baseline.py >> $LOG 2>&1
timeout 1800 python scripts/generate_figures.py >> $LOG 2>&1 || true
echo "outputs/experiment_results.json outputs/COMPREHENSIVE_REPORT.md" >> /tmp/gates_todo
timeout 2700 python process.py --input data/raw/synth_hard_30fps.mp4 \
  --output outputs/deploy_r5/flagship_120fps_1440p.mp4 \
  --method flagship --target-fps 120 --target-resolution 1440p \
  --max-frames 120 --stats-out outputs/deploy_r5/stats.json \
  > /tmp/deploy_r5.log 2>&1
echo "$(date) stage6 deploy rc=$? $(head -c 200 outputs/deploy_r5/stats.json 2>/dev/null)" >> $LOG

touch /tmp/gates_stop
echo "$(date) chip_r5 queue FINISHED" >> $LOG
