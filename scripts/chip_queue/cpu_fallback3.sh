#!/bin/bash
# CPU fallback v3: adaptive rows, keystone-first ordering.
# adaptive_aggressive interval 0 is THE done-criterion row
# (VERDICT: adaptive_aggressive >= rife_default VFI PSNR on hard content).
cd /root/repo
LOG=/tmp/queue.log
echo "$(date) CPU-FALLBACK v3 begins (adaptive keystone-first)" >> $LOG
for spec in "adaptive_aggressive 0" "adaptive_aggressive 1" "adaptive_default 0" "adaptive_default 1"; do
  set -- $spec
  timeout 7200 python scripts/run_experiments.py --clip synth_hard_001 \
    --intervals $2 --heavy --resume --platform cpu --no-lpips --max-frames 60 \
    --output-dir outputs/cpu_fallback --experiment $1 \
    >> outputs/cpu_fallback/sweep.log 2>&1
  echo "$(date) CPU-FALLBACK v3 $1 i$2 done rc=$?" >> $LOG
done
echo "$(date) CPU-FALLBACK v3 FINISHED" >> $LOG
