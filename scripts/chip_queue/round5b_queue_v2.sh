#!/bin/bash
# Round-5 queue v2 (reprioritized after supervisor takeover at 02:35).
# Differences vs /tmp/chip_r5.sh: sweeps moved BEFORE the ordering study
# (cheap + needed for the dual-harness adaptive>=rife proof), ordering
# study shrinks itself when late, deploy last, every stage hard-bounded
# so the chip is free before the driver's end-of-round bench.
cd /root/repo
LOG=/tmp/queue.log
echo "$(date) chip_r5b queue v2 starts" >> $LOG

# ---- stage 2 (inherited): wait for the running calibration to exit ----
while kill -0 3236 2>/dev/null; do sleep 30; done
echo "$(date) stage2 calibrate exited" >> $LOG
python - >> $LOG 2>&1 <<'PYEOF'
import json
g = json.load(open('weights/router_gate.json'))
print('router_gate keys:', sorted(g))
for regime, bins in (g.get('expert_bins') or {}).items():
    for b in bins:
        print(f"  {regime} [{b['motion_lo']:.2f},{b['motion_hi']:.2f}): "
              + " ".join(f"{k}={v:.2f}" for k, v in b.items()
                         if k not in ('motion_lo', 'motion_hi', 'n')))
PYEOF
echo "weights/router_gate.json" >> /tmp/gates_todo

# ---- stage 3: 13-model benchmark refresh (atomic — do not kill) ----
timeout 10800 python benchmark.py -d data/processed -o outputs/benchmarks \
  --max-triplets 8 > /tmp/benchmark_r5.log 2>&1
echo "$(date) stage3 benchmark done rc=$?" >> $LOG
echo "outputs/benchmarks/benchmark_results.json" >> /tmp/gates_todo

# ---- stage 4: sweep refresh — quality-aware adaptive rows ----
timeout 1800 python scripts/run_experiments.py --clip synth_hard_001 \
  --intervals 0,1 --heavy --replace --experiment adaptive_aggressive \
  >> /tmp/sweep_r5.log 2>&1
echo "$(date) stage4a done rc=$?" >> $LOG
timeout 1800 python scripts/run_experiments.py --clip synth_hard_002 \
  --intervals 0,1 --heavy --replace --experiment adaptive_aggressive \
  >> /tmp/sweep_r5.log 2>&1
echo "$(date) stage4b done rc=$?" >> $LOG
timeout 1800 python scripts/run_experiments.py --clip synth_001 \
  --intervals 0,1,2 --heavy --replace --experiment adaptive_aggressive \
  >> /tmp/sweep_r5.log 2>&1
echo "$(date) stage4c done rc=$?" >> $LOG
timeout 1200 python scripts/generate_comprehensive_report.py >> $LOG 2>&1
timeout 1200 python scripts/compare_baseline.py >> $LOG 2>&1
echo "outputs/experiment_results.json outputs/COMPREHENSIVE_REPORT.md" >> /tmp/gates_todo

# ---- stage 5: ordering study rerun (fixed GT indexing, A/B families) ----
# shrink when the round clock is late (past 05:30 UTC)
PAIRS=40
if [ "$(date +%H%M)" -gt 0530 ]; then PAIRS=16; fi
timeout 3600 python scripts/lpips_ordering_study.py --pairs $PAIRS --stride 5 \
  > /tmp/ordering_r5.log 2>&1
echo "$(date) stage5 ordering done rc=$? pairs=$PAIRS" >> $LOG
echo "outputs/lpips_ordering.json" >> /tmp/gates_todo

# ---- stage 6: deploy (bounded, skip when past 06:05) ----
if [ "$(date +%H%M)" -lt 0605 ]; then
  timeout 1500 python process.py --input data/raw/synth_hard_30fps.mp4 \
    --output outputs/deploy_r5/flagship_120fps_1440p.mp4 \
    --method flagship --target-fps 120 --target-resolution 1440p \
    --max-frames 120 --stats-out outputs/deploy_r5/stats.json \
    > /tmp/deploy_r5.log 2>&1
  echo "$(date) stage6 deploy rc=$? $(head -c 200 outputs/deploy_r5/stats.json 2>/dev/null)" >> $LOG
else
  echo "$(date) stage6 deploy SKIPPED (late)" >> $LOG
fi

touch /tmp/gates_stop
echo "$(date) chip_r5b queue v2 FINISHED" >> $LOG
