#!/bin/bash
# CPU fallback, pivoted (09:20): keystone rows only.
# 1. rife_default on both hard intervals at 60 kf (the neural-vs-blend
#    evidence at real statistical weight)
# 2. cheap blend/degraded rows on interval 1 (2-interval coverage)
# 3. adaptive_aggressive + adaptive_default at 60 kf (the router rows)
cd /root/repo
LOG=/tmp/queue.log
echo "$(date) CPU-FALLBACK v2 begins" >> $LOG
echo $$ > /tmp/cpu_fallback.pid
timeout 7200 python scripts/run_experiments.py --clip synth_hard_001 \
  --intervals 0,1 --heavy --resume --platform cpu --no-lpips --max-frames 60 \
  --output-dir outputs/cpu_fallback --experiment rife_default \
  >> outputs/cpu_fallback/sweep.log 2>&1
echo "$(date) CPU-FALLBACK v2 rife done rc=$?" >> $LOG
timeout 7200 python scripts/run_experiments.py --clip synth_hard_001 \
  --intervals 1 --resume --platform cpu --no-lpips \
  --output-dir outputs/cpu_fallback \
  --experiment degraded,bicubic_blend,lanczos_blend,optical_flow_basic \
  >> outputs/cpu_fallback/sweep.log 2>&1
echo "$(date) CPU-FALLBACK v2 light-i1 done rc=$?" >> $LOG
timeout 7200 python scripts/run_experiments.py --clip synth_hard_001 \
  --intervals 0,1 --heavy --resume --platform cpu --no-lpips --max-frames 60 \
  --output-dir outputs/cpu_fallback \
  --experiment adaptive_aggressive,adaptive_default \
  >> outputs/cpu_fallback/sweep.log 2>&1
echo "$(date) CPU-FALLBACK v2 adaptive done rc=$?" >> $LOG
