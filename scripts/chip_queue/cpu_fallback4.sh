#!/bin/bash
# CPU fallback v4: synth_hard_002 (routing corpus) keystone rows.
# Criterion row pair first: adaptive_aggressive vs rife_default.
cd /root/repo
LOG=/tmp/queue.log
echo "$(date) CPU-FALLBACK v4 begins (synth_hard_002 keystones)" >> $LOG
for spec in "adaptive_aggressive 0" "rife_default 0" "adaptive_default 0" \
            "bicubic_blend 0" "lanczos_blend 0" "degraded 0" \
            "adaptive_aggressive 1" "rife_default 1" "adaptive_default 1" \
            "bicubic_blend 1" "lanczos_blend 1" "degraded 1"; do
  set -- $spec
  timeout 7200 python scripts/run_experiments.py --clip synth_hard_002 \
    --intervals $2 --heavy --resume --platform cpu --no-lpips --max-frames 60 \
    --output-dir outputs/cpu_fallback --experiment $1 \
    >> outputs/cpu_fallback/sweep.log 2>&1
  echo "$(date) CPU-FALLBACK v4 $1 i$2 done rc=$?" >> $LOG
done
echo "$(date) CPU-FALLBACK v4 FINISHED" >> $LOG
