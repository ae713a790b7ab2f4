#!/bin/bash
# Chain stage 2 (sweep) after stage 1 (vfimamba training) finishes.
while ! grep -q "stage1 FINISHED" /tmp/queue.log 2>/dev/null; do sleep 120; done
bash /tmp/stage2_sweep.sh
