#!/bin/bash
# Stage 3 (fires after "stage2 FINISHED" appears in /tmp/queue.log):
#   a) resume SAFA from the step-4000 checkpoint for 8000 more steps
#   b) held-out SAFA eval -> log for PARITY update
#   c) end-to-end deployment run: 30fps 1080p -> 120fps 1440p via the
#      fused flagship path, stage stats persisted (VERDICT item 10)
#   d) span_x2 detail fine-tune (VERDICT item 9), then detail-scene eval
cd /root/repo
LOG=/tmp/queue.log
mkdir -p outputs/train_r3

echo "$(date) stage3a: safa resume begins" >> $LOG
timeout 10800 python scripts/train.py --model safa --steps 8000 \
  --batch 16 --crop 128 --resume weights/safa.npz \
  --save-every 500 --log-every 50 > /tmp/train_safa_r3.log 2>&1
echo "$(date) stage3a done rc=$?" >> $LOG

echo "$(date) stage3b: safa eval" >> $LOG
timeout 3600 python scripts/eval_vfi_quality.py --models safa,rife,lanczos --crop 256 \
  > outputs/train_r3/eval_safa.txt 2>&1
echo "$(date) stage3b done rc=$?" >> $LOG

echo "$(date) stage3c: deployment run" >> $LOG
mkdir -p outputs/deploy_r3 outputs/train_r3
timeout 5400 python process.py --input data/raw/synth_hard_30fps.mp4 \
  --output outputs/deploy_r3/flagship_120fps_1440p.mp4 \
  --method flagship --target-fps 120 --target-resolution 1440p \
  --stats-out outputs/deploy_r3/stats.json > /tmp/deploy_r3.log 2>&1
echo "$(date) stage3c done rc=$?" >> $LOG

echo "$(date) stage3d: span_x2 detail fine-tune" >> $LOG
timeout 7200 python scripts/train.py --model span --steps 4000 \
  --batch 32 --crop 96 --detail 1.0 --resume weights/span_x2.npz \
  --save-every 500 --log-every 50 > /tmp/train_span2_r3.log 2>&1
echo "$(date) stage3d done rc=$?" >> $LOG
timeout 3600 python scripts/eval_sr_quality.py --scene detail \
  > outputs/train_r3/eval_sr_detail.txt 2>&1
timeout 3600 python scripts/eval_sr_quality.py --scene smooth \
  > outputs/train_r3/eval_sr_smooth.txt 2>&1
echo "$(date) stage3 FINISHED" >> $LOG

# --- appended mid-run (append-only; stage3a was executing above) ---
# stage3e: extend SAFA to the VERDICT's ~12k steps, gated against the
# completed-8k snapshot so a timeout cut can never strand a worse ckpt.
echo "$(date) stage3e: safa extension 8000->12000 (guarded)" >> $LOG
NOW=$(date +%s)
# STAGE3E_STOP parameterizes the budget gate for reruns; the default is the
# historical round-3 cutoff (i.e., with no env override this script is a
# run record and stage3e will log SKIPPED).
STOP=$(date -u -d "${STAGE3E_STOP:-2026-08-19 00:50:00}" +%s)
BUDGET=$(( STOP - NOW ))
if [ "$BUDGET" -gt 4800 ]; then
  cp weights/safa.npz /tmp/safa_8k.npz
  timeout $BUDGET python scripts/train.py --model safa --steps 12000 \
    --batch 16 --crop 128 --resume weights/safa.npz \
    --save-every 500 --log-every 50 > /tmp/train_safa12k_r3.log 2>&1
  echo "$(date) stage3e train rc=$?" >> $LOG
  timeout 1800 python scripts/gate_checkpoint.py --candidate safa \
    --incumbent safa --incumbent-weights /tmp/safa_8k.npz \
    --weights weights/safa.npz --demote-to weights/safa_cut.npz \
    --record outputs/train_r3/gate_safa12k.json >> $LOG 2>&1
  echo "$(date) stage3e gate rc=$?" >> $LOG
  timeout 2400 python scripts/eval_vfi_quality.py --models safa,rife,lanczos \
    --crop 256 > outputs/train_r3/eval_safa12k.txt 2>&1
  echo "$(date) stage3e eval rc=$?" >> $LOG
else
  echo "$(date) stage3e SKIPPED (budget ${BUDGET}s < 4800s)" >> $LOG
fi
echo "$(date) stage3 ALL-DONE" >> $LOG
