#!/bin/bash
# Waits for the TPU tunnel, then: (1) fresh bench capture, (2) full-size
# VFIMamba training (round-3 long pole). Logs to /tmp/.
cd /root/repo
while true; do
  if timeout 240 python -c "import jax; jax.devices()" > /dev/null 2>&1; then
    echo "$(date) TUNNEL UP" >> /tmp/queue.log
    break
  fi
  echo "$(date) tunnel still down" >> /tmp/queue.log
  sleep 120
done
echo "$(date) running bench.py" >> /tmp/queue.log
timeout 2400 python bench.py > /tmp/bench_r3.log 2>/tmp/bench_r3_err.log
echo "$(date) bench rc=$? result: $(cat /tmp/bench_r3.log)" >> /tmp/queue.log
echo "$(date) starting vfimamba full training" >> /tmp/queue.log
# batch 8 / crop 128 OOMs HBM for the FULL variant (16.05G of 15.75G —
# the S variant fits at batch 8; the full net's S6 backward temps don't).
timeout 21600 python scripts/train.py --model vfimamba --steps 12000 \
  --batch 6 --crop 128 --save-every 500 --log-every 50 \
  > /tmp/train_vfimamba.log 2>&1
echo "$(date) vfimamba training rc=$?" >> /tmp/queue.log
echo "$(date) stage1 FINISHED" >> /tmp/queue.log
