#!/bin/bash
# Round-5 chip queue. Fires after the vfimamba v3 training extension
# (launched at round start) exits; every artifact-writing stage is
# followed by gate_suite.sh (fast suite + revert-on-red — CLAUDE.md,
# round-4 verdict task #4). Run from a /tmp copy:
#   cp scripts/chip_queue/round5.sh /tmp/round5.sh && nohup bash /tmp/round5.sh &
cd /root/repo
LOG=/tmp/queue.log
GATE=scripts/chip_queue/gate_suite.sh
mkdir -p outputs/train_r5 outputs/deploy_r5
echo "$(date) round5 queue starts" >> $LOG

# ---- stage 0: wait for the v3 training process to exit ----
for PID in $(cat /tmp/train_r5.pid 2>/dev/null); do
  while kill -0 "$PID" 2>/dev/null; do sleep 60; done
done
echo "$(date) stage0: training exited ($(tail -2 /tmp/train_vfimamba_r5.log | head -1))" >> $LOG

# ---- stage 1: gate v3 against the incumbent, promote on win ----
if [ -f weights/vfimamba_v3.npz ]; then
  timeout 3600 python scripts/gate_checkpoint.py --candidate vfimamba \
    --incumbent vfimamba --weights weights/vfimamba_v3.npz \
    --incumbent-weights weights/vfimamba.npz \
    --demote-to weights/vfimamba_v3_rejected.npz \
    --record outputs/train_r5/gate_vfimamba_v3.json >> $LOG 2>&1
  python - >> $LOG 2>&1 <<'EOF'
import json, shutil
r = json.load(open('outputs/train_r5/gate_vfimamba_v3.json'))
print('gate decision:', r.get('decision'), r.get('candidate_psnr_db'),
      'vs', r.get('incumbent_psnr_db'))
if str(r.get('decision', '')).startswith('kept'):
    shutil.copy('weights/vfimamba_v3.npz', 'weights/vfimamba.npz')
    print('promoted v3 -> weights/vfimamba.npz')
EOF
fi
echo "$(date) stage1 done rc=$?" >> $LOG

# ---- stage 2: full router calibration on-chip ----
# scene_gate was calibrated on CPU earlier this round; keep it if present
SKIP_SG=""
python -c "import json,sys; g=json.load(open('weights/router_gate.json')); sys.exit(0 if g.get('scene_gate') else 1)" \
  && SKIP_SG="--skip-scene-gate"
CALIB_CLIPS="data/raw/synth_calib.mp4,data/raw/synth_calib_routing.mp4,data/raw/synth_calib_smooth.mp4"
timeout 9000 python scripts/calibrate_router.py $SKIP_SG \
  --clip "$CALIB_CLIPS" --native-clips "$CALIB_CLIPS" \
  --pairs 40 --stride 4 --native-pairs 30 \
  > /tmp/calibrate_r5.log 2>&1
echo "$(date) stage2 calibrate done rc=$?" >> $LOG
bash $GATE $LOG weights/router_gate.json
echo "$(date) stage2 gate rc=$?" >> $LOG

# ---- stage 3: fresh bench record (fps + MFU with the new fused gate) ----
timeout 3600 python bench.py > /tmp/bench_r5.log 2>&1
echo "$(date) stage3 bench rc=$? $(tail -1 /tmp/bench_r5.log)" >> $LOG

# ---- stage 4: ordering study rerun (fixed GT indexing, 3 families) ----
timeout 7200 python scripts/lpips_ordering_study.py --pairs 40 --stride 5 \
  > /tmp/ordering_r5.log 2>&1
echo "$(date) stage4 ordering done rc=$?" >> $LOG
bash $GATE $LOG outputs/lpips_ordering.json
echo "$(date) stage4 gate rc=$?" >> $LOG

# ---- stage 5: 13-model benchmark refresh (atomic — do not kill) ----
timeout 14400 python benchmark.py -d data/processed -o outputs/benchmarks \
  --max-triplets 8 > /tmp/benchmark_r5.log 2>&1
echo "$(date) stage5 benchmark done rc=$?" >> $LOG
bash $GATE $LOG outputs/benchmarks/benchmark_results.json
echo "$(date) stage5 gate rc=$?" >> $LOG

# ---- stage 6: sweep refresh — quality-aware adaptive rows only ----
timeout 7200 python scripts/run_experiments.py --clip synth_hard_001 \
  --intervals 0,1 --heavy --replace --experiment adaptive_aggressive \
  >> outputs/sweep_r5.log 2>&1
echo "$(date) stage6a done rc=$?" >> $LOG
timeout 7200 python scripts/run_experiments.py --clip synth_hard_002 \
  --intervals 0,1 --heavy --replace --experiment adaptive_aggressive \
  >> outputs/sweep_r5.log 2>&1
echo "$(date) stage6b done rc=$?" >> $LOG
timeout 7200 python scripts/run_experiments.py --clip synth_001 \
  --intervals 0,1,2 --heavy --replace --experiment adaptive_aggressive \
  >> outputs/sweep_r5.log 2>&1
echo "$(date) stage6c done rc=$?" >> $LOG

# ---- stage 7: analysis layer regen + suite gate ----
timeout 1800 python scripts/generate_comprehensive_report.py >> $LOG 2>&1
timeout 1800 python scripts/compare_baseline.py >> $LOG 2>&1
timeout 1800 python scripts/generate_figures.py >> $LOG 2>&1 || true
bash $GATE $LOG outputs/experiment_results.json outputs/COMPREHENSIVE_REPORT.md
echo "$(date) stage7 gate rc=$?" >> $LOG

# ---- stage 8: deployment run (writer-thread pipeline, fresh stats) ----
timeout 5400 python process.py --input data/raw/synth_hard_30fps.mp4 \
  --output outputs/deploy_r5/flagship_120fps_1440p.mp4 \
  --method flagship --target-fps 120 --target-resolution 1440p \
  --stats-out outputs/deploy_r5/stats.json > /tmp/deploy_r5.log 2>&1
echo "$(date) stage8 deploy rc=$? $(cat outputs/deploy_r5/stats.json 2>/dev/null | head -c 200)" >> $LOG

echo "$(date) round5 queue FINISHED" >> $LOG
