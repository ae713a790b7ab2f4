#!/bin/bash
# Retry full-size VFIMamba training at batch 6 (batch 8 / crop 128 OOM'd
# HBM by 307MB: 16.05G needed of 15.75G).
cd /root/repo
echo "$(date) stage1b: vfimamba training batch 6" >> /tmp/queue.log
timeout 21600 python scripts/train.py --model vfimamba --steps 12000 \
  --batch 6 --crop 128 --save-every 500 --log-every 50 \
  > /tmp/train_vfimamba.log 2>&1
echo "$(date) vfimamba training rc=$?" >> /tmp/queue.log
echo "$(date) stage1b FINISHED" >> /tmp/queue.log
